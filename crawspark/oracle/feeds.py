"""RSS 2.0 / Atom 1.0 feed parsing for frontier discovery.

The companion to oracle/sitemap.py: feeds are the other standing
discovery surface a crawler polls. ``parse_feed`` normalizes both
dialects to one record shape per entry — (fmt, title, link,
published) — handling the structural differences: RSS links are
element TEXT, Atom links are an href ATTRIBUTE (preferring
rel="alternate" when several are present); RSS dates are pubDate,
Atom's are updated. Root detection is namespace-tolerant (Atom's
default namespace vs bare RSS). stdlib ElementTree; malformed XML
yields [].
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

_ATOM = "http://www.w3.org/2005/Atom"


def parse_feed(xml_text: str) -> list[dict]:
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    tag = root.tag
    out: list[dict] = []
    if tag == "rss":
        for item in root.iter("item"):
            out.append({
                "fmt": "rss",
                "title": (item.findtext("title") or "").strip(),
                "link": (item.findtext("link") or "").strip(),
                "published": (item.findtext("pubDate") or "").strip(),
            })
    elif tag == f"{{{_ATOM}}}feed" or tag == "feed":
        ns = f"{{{_ATOM}}}" if tag.startswith("{") else ""
        for entry in root.iter(f"{ns}entry"):
            href = ""
            # prefer rel="alternate"; fall back only to CONTENT rels —
            # a feed whose entry carries only rel="self"/"enclosure"
            # must yield an empty link, not enqueue the feed itself
            # (r5 review finding)
            for ln in entry.findall(f"{ns}link"):
                rel = ln.get("rel", "alternate")
                if rel == "alternate":
                    href = ln.get("href", "")
                    break
                if not href and rel not in ("self", "enclosure", "hub",
                                            "replies", "edit"):
                    href = ln.get("href", "")
            out.append({
                "fmt": "atom",
                "title": (entry.findtext(f"{ns}title") or "").strip(),
                "link": href,
                "published": (entry.findtext(f"{ns}updated") or "").strip(),
            })
    return out


def make_feed(doc_id: int) -> str:
    """Deterministic feed for doc d: Atom when d % 2 == 0 (with a
    rel="self" decoy link before the alternate on every third entry),
    RSS 2.0 otherwise. 2 + d % 4 entries; entry j links to
    https://f{d % 23}.example.com/post/{d}/{j} dated 2025-02-01 +
    (d + j) % 300 days (RFC 1123 for RSS, ISO for Atom)."""
    import datetime
    import email.utils

    d = doc_id
    n = 2 + d % 4
    items = []
    for j in range(n):
        url = f"https://f{d % 23}.example.com/post/{d}/{j}"
        day = (datetime.datetime(2025, 2, 1, 12, 0, 0,
                                 tzinfo=datetime.timezone.utc)
               + datetime.timedelta(days=(d + j) % 300))
        if d % 2 == 0:
            decoy = (f'<link rel="self" href="https://f{d % 23}'
                     f'.example.com/feed.xml"/>' if (d + j) % 3 == 0 else "")
            items.append(
                f"<entry><title>post {d}-{j}</title>{decoy}"
                f'<link rel="alternate" href="{url}"/>'
                f"<updated>{day.strftime('%Y-%m-%dT%H:%M:%SZ')}</updated>"
                f"<id>urn:post:{d}:{j}</id></entry>")
        else:
            items.append(
                f"<item><title>post {d}-{j}</title><link>{url}</link>"
                f"<pubDate>{email.utils.format_datetime(day)}</pubDate>"
                f"<guid>urn:post:{d}:{j}</guid></item>")
    if d % 2 == 0:
        return (f'<feed xmlns="{_ATOM}"><title>feed {d}</title>'
                + "".join(items) + "</feed>")
    return ("<rss version=\"2.0\"><channel>"
            f"<title>feed {d}</title>" + "".join(items)
            + "</channel></rss>")
