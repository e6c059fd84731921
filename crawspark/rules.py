"""Versioned rule data: stopword lists, boilerplate/adblock regexes.

These are DATA, pinned as ``RULES_VERSION``; golden fixtures are generated
against a specific version (FIXTURES.md §1.4). Changing anything here
requires regenerating fixtures (``python tools/gen_fixtures.py``).

Reference loci (reconstructed, SURVEY.md §2.3):
- stopword lists      [R: goose/resources/text/stopwords-<lang>.txt]
- bad id/class regex  [R: goose/cleaners.py::DocumentCleaner regex lists]
- banned image names  [R: goose/images/extractors.py badimages regex]
- video providers     [R: goose/videos/extractors.py provider list]
- url ad rules        [R: url.py::Url.is_valid bad-domain/extension lists]
"""

from __future__ import annotations

import re

RULES_VERSION = "rules_v1"

# ---------------------------------------------------------------------------
# Stopwords (compact, frozen subsets; enough for stopword-weighted scoring).
# ---------------------------------------------------------------------------

STOPWORDS_EN = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers him
    his how i if in into is it its itself just me more most my no nor not of
    off on once only or other our ours out over own same she should so some
    such than that the their theirs them then there these they this those
    through to too under until up very was we were what when where which while
    who whom why will with would you your yours""".split()
)

STOPWORDS_FR = frozenset(
    """au aux avec ce ces cette dans de des du elle elles en et eux il ils je
    la le les leur leurs lui ma mais me meme mes moi mon ne nos notre nous on
    ou par pas pour qu que qui sa se ses son sur ta te tes toi ton tu un une
    vos votre vous y d l j n s t c qu est sont etait sera ete avoir plus tres
    bien tout tous toute toutes comme aussi fait faire peut sans sous entre
    apres avant chez donc ainsi alors cela celui celle deja encore depuis""".split()
)

STOPWORDS = {"en": STOPWORDS_EN, "fr": STOPWORDS_FR}

# ---------------------------------------------------------------------------
# Boilerplate: node dropped when id/class matches (cleaner stage).
# ---------------------------------------------------------------------------

BAD_ATTR_TOKENS = (
    "combx|comment|community|disqus|extra|foot|footer|footnote|header|masthead|"
    "media-promo|menu|nav|navbar|pagination|pager|popup|retweet|share|shoutbox|"
    "sidebar|sponsor|social|ad-break|adsense|ad-zone|advert|agegate|banner|"
    "breadcrumbs|byline|cnn_strycaptiontxt|cnn_html_slideshow|cnn_strylftcntnt|"
    "links|meta$|scroll|shoutbox|sponsor|tags|tool|widget|subscribe|cookie|"
    "promo|related|recommend|newsletter|outbrain|taboola|tracking|skyscraper"
)
RE_BAD_ATTR = re.compile(BAD_ATTR_TOKENS, re.IGNORECASE)

# Attribute values that rescue a node even if RE_BAD_ATTR matches
# (Goose keeps article-ish containers).
RE_GOOD_ATTR = re.compile(
    r"article|article-body|articlebody|story|post-content|main-content|entry",
    re.IGNORECASE,
)

# Tags removed outright by the cleaner.
REMOVE_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "form", "button",
     "input", "select", "option", "textarea", "link"}
)

# Inline tags unwrapped (replaced by their children) by the cleaner.
UNWRAP_TAGS = frozenset({"em", "strong", "b", "i", "u", "span", "font", "small"})

# Block-level tags: a <div> containing none of these converts to <p>.
BLOCK_TAGS = frozenset(
    {"div", "p", "table", "ul", "ol", "dl", "blockquote", "pre", "article",
     "section", "aside", "nav", "header", "footer", "h1", "h2", "h3", "h4",
     "h5", "h6", "figure", "iframe", "video", "object", "embed", "img"}
)

# ---------------------------------------------------------------------------
# Adblock-style media / URL rules.
# ---------------------------------------------------------------------------

BANNED_IMG_NAMES = (
    r"\.html|\.gif$|\.ico$|button|btn_|twitter\.jpg|facebook\.jpg|"
    r"ap_buy_photo|digg\.jpg|digg\.png|delicious\.png|facebook\.png|"
    r"reddit\.jpg|doubleclick|diggthis|diggThis|adserver|/ads/|ec\.atdmt\.com|"
    r"mediaplex\.com|adsatt|view\.atdmt|spacer|blank|pixel|1x1|banner|"
    r"sprite|icon_|_icon|logo_|_logo|badge|avatar"
)
RE_BANNED_IMG = re.compile(BANNED_IMG_NAMES, re.IGNORECASE)

VIDEO_PROVIDERS = ("youtube", "youtu.be", "vimeo", "dailymotion")

# Adblock-style URL rules (applied to outlinks / media URLs).
URL_AD_RULES: list[tuple[str, str, str, str]] = [
    # (rule_id, scope, pattern, action) — FIXTURES.md §1.4 shape.
    ("r001", "url", r"doubleclick\.net", "drop"),
    ("r002", "url", r"googlesyndication", "drop"),
    ("r003", "url", r"/ads?/", "drop"),
    ("r004", "url", r"[?&]utm_", "drop"),
    ("r005", "url", r"adserver", "drop"),
    ("r006", "url", r"outbrain|taboola", "drop"),
    ("r007", "url", r"\.(exe|zip|gz|dmg|apk)$", "drop"),
    ("r008", "url", r"tracker|tracking\.", "drop"),
    ("r009", "img_filename", r"twitter\.jpg$|facebook\.jpg$", "drop"),
    ("r010", "img_filename", r"spacer|blank|pixel|1x1", "drop"),
    ("r011", "element_attr", r"sponsor|advert|adsense", "drop"),
]
RE_URL_AD = re.compile(
    "|".join(p for _, scope, p, _ in URL_AD_RULES if scope == "url"),
    re.IGNORECASE,
)

# Title splitters: site-name separators; keep longest fragment.
TITLE_SPLITTERS = (" | ", " - ", " » ", " :: ")
