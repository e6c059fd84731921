"""Media reference resolution in DOM order.

Reference loci (reconstructed): [R: goose/images/extractors.py::
ImageExtractor.get_best_image + badimages regex; goose/videos/extractors.py::
VideoExtractor]. Differences pinned by SURVEY.md §2.3 ``resolve_media``:
no network size probing — attribute/filename heuristics only; ALL qualifying
media in the content sequence are emitted as spans in DOM position (the
span-sequence output model generalizes the reference's single top_image).
"""

from __future__ import annotations

from urllib.parse import urljoin

from crawspark.oracle.dom import Node
from crawspark.rules import RE_BANNED_IMG, VIDEO_PROVIDERS

MIN_DIMENSION = 50  # px; reference skips tiny images [R: image size checks]


def image_ok(node: Node) -> bool:
    src = node.attr("src")
    if not src or RE_BANNED_IMG.search(src):
        return False
    for dim in ("width", "height"):
        raw = node.attr(dim).rstrip("px")
        if raw:
            try:
                if int(raw) < MIN_DIMENSION:
                    return False
            except ValueError:
                pass
    return True


def video_src(node: Node) -> str:
    """Provider-whitelisted video URL from iframe/embed/object, else ''."""
    src = node.attr("src") or node.attr("data")
    if src and any(p in src for p in VIDEO_PROVIDERS):
        return src
    return ""


def absolutize(url: str, base: str) -> str:
    if not url or not base:
        return url
    try:
        return urljoin(base, url)
    except ValueError:
        return url


def media_kind_for_ref(media_ref: str) -> str:
    """Input-level ``media`` spans: classify by extension/scheme."""
    low = media_ref.lower()
    if low.startswith("video://") or any(
        low.endswith(ext) for ext in (".mp4", ".webm", ".mov", ".avi", ".mkv")
    ) or any(p in low for p in VIDEO_PROVIDERS):
        return "video"
    return "image"
