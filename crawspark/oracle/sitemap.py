"""Sitemap parsing (sitemaps.org protocol) — frontier seeding for the
crawl loop, the natural companion to the robots.txt gate
(oracle/robots.py). Reconstructed behavior: crawtext seeds its frontier
from start URLs and discovered outlinks [R: crawtext crawl loop]; a
production crawler also seeds from /sitemap.xml, so this module parses
both document kinds the protocol defines:

- ``<urlset>``: one entry per ``<url>`` with ``loc`` (required; entries
  without it are dropped per the spec), optional ``lastmod`` and
  ``priority``.
- ``<sitemapindex>``: child ``<sitemap><loc>`` references to nested
  sitemap files (kind='sitemap', so the crawler knows to fetch and
  recurse rather than enqueue).

Parsing is namespace-agnostic (real sitemaps carry the
sitemaps.org/schemas/sitemap/0.9 namespace, hand-rolled ones often do
not) via stdlib ElementTree; malformed XML yields [] rather than
raising.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(text: str) -> list[dict]:
    """List of {loc, lastmod, priority, kind} from sitemap XML, in
    document order. kind is 'url' for urlset entries, 'sitemap' for
    index children. Never raises; unparseable input yields []."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return []
    out: list[dict] = []
    kind = _local(root.tag)
    if kind == "urlset":
        for url in root:
            if _local(url.tag) != "url":
                continue
            rec = {"loc": "", "lastmod": "", "priority": -1.0,
                   "kind": "url"}
            for child in url:
                t = _local(child.tag)
                if t in ("loc", "lastmod"):
                    rec[t] = (child.text or "").strip()
                elif t == "priority":
                    try:
                        rec["priority"] = float((child.text or "").strip())
                    except ValueError:
                        pass
            if rec["loc"]:  # loc is required by the protocol
                out.append(rec)
    elif kind == "sitemapindex":
        for sm in root:
            if _local(sm.tag) != "sitemap":
                continue
            for child in sm:
                if _local(child.tag) == "loc" and child.text:
                    out.append({"loc": child.text.strip(), "lastmod": "",
                                "priority": -1.0, "kind": "sitemap"})
    return out


def make_sitemap(doc_id: int) -> str:
    """Deterministic sitemap XML for a host: every 7th document serves a
    sitemapindex (2 + d%3 child sitemaps), the rest a urlset of
    3 + d%5 urls with lastmod = 2025-01-01 + (d+j)%365 days and
    priority = ((d+j)%10)/10 (closed forms a SQL oracle replays). Half
    the urlset docs carry the real sitemaps.org namespace, half none —
    both must parse."""
    import datetime

    d = int(doc_id)
    if d % 7 == 0:
        kids = "".join(
            f"<sitemap><loc>https://s{d % 37}.example.com/sm/{d}/"
            f"child{j}.xml</loc></sitemap>"
            for j in range(2 + d % 3))
        return f"<sitemapindex>{kids}</sitemapindex>"
    # keyed off d // 2 so the toggle still alternates under callers
    # that pre-filter doc_id to a fixed parity, e.g. the registry's
    # d % 6 == 2 which is always even (r5 review finding)
    ns = (' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
          if (d // 2) % 2 == 0 else "")
    urls = []
    for j in range(3 + d % 5):
        day = (datetime.date(2025, 1, 1)
               + datetime.timedelta(days=(d + j) % 365)).isoformat()
        urls.append(
            f"<url><loc>https://s{d % 37}.example.com/p/{d}/{j}</loc>"
            f"<lastmod>{day}</lastmod>"
            f"<priority>{((d + j) % 10) / 10}</priority></url>")
    return f"<urlset{ns}>{''.join(urls)}</urlset>"
