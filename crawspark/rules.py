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

RULES_VERSION = "rules_v4"  # v2: + de/es/it/pt/zh; v3: + ru/nl; v4: + ja/ar

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

STOPWORDS_DE = frozenset(
    """der die das und in den von zu mit sich des auf fur für ist im dem
    nicht ein eine als auch es an werden aus er hat dass sie nach wird bei
    einer um am sind noch wie einem uber über einen so zum war haben nur
    oder aber vor zur bis mehr durch man sein wurde sei ihm ihre ihren wir
    kann doch schon wenn hier alle ihr diese dieser dieses unter wieder
    keine da zwischen immer selbst uns dann ohne sehr sondern mich dich
    gegen vom ganz einzelnen wo muss sollte konnte jetzt""".split()
)

STOPWORDS_ES = frozenset(
    """de la que el en y a los del se las por un para con no una su al lo es
    como mas más pero sus le ya o este si sí porque esta entre cuando muy
    sin sobre tambien también me hasta hay donde quien desde todo nos
    durante todos uno les ni contra otros ese eso ante ellos e esto mi mí
    antes algunos que qué unos yo otro otras otra el él tanto esa estos
    mucho quienes nada muchos cual cuál poco ella estar estas algunas algo
    nosotros era eran fue son ser tiene tienen hacer cada estaba estamos
    alli allí aqui aquí""".split()
)

STOPWORDS_IT = frozenset(
    """di a da in con su per tra fra il lo la i gli le un uno una che e
    non si e è sono come piu più ma anche questo questa quello quella dei
    delle della del al alla alle nel nella ha hanno era erano essere sia
    o se ci vi ne lui lei loro noi voi io tu suo sua suoi sue mio mia
    miei mie tuo tua nostro nostra vostro vostra chi cui dove quando
    perche perché cosa tutto tutti tutte ogni fare fatto stato stata
    quindi ancora sempre dopo prima senza molto poi anni solo altri
    altre altro altra questi queste""".split()
)

STOPWORDS_PT = frozenset(
    """de a o que e do da em um para e é com nao não uma os no se na por
    mais as dos como mas foi ao ele das tem a à seu sua ou ser quando
    muito ha há nos ja já esta está eu tambem também so só pelo pela ate
    até isso ela entre era depois sem mesmo aos ter seus quem nas me esse
    eles estao estão voce você tinha foram essa num nem suas meu as às
    minha tem têm numa pelos qual sera será nós tenho lhe deles essas
    esses pelas este fosse dele outro outros outra outras isto aquilo
    estas estes""".split()
)

# Chinese: single-character function words — CJK text has no whitespace
# word boundaries, so zh stopword stats run on per-character tokens
# [R: goose/text.py::StopWordsChinese — candidate words are characters].
STOPWORDS_ZH = frozenset(
    "的 了 是 在 我 有 和 就 不 人 都 一 这 上 中 大 为 来 个 国 到 说 们 "
    "以 于 时 要 也 他 会 着 没 好 自 能 对 她 那 得 里 后 你 将 与 已 其 "
    "被 此 但 并 很 从 或 而 之 把 向 所 又 及 更 些 只 此 使 因 由 再 如 "
    "下 去 过 还 可 地 年 月 日".split()
)

# Russian: cyrillic survives the \w-based tokenizer unchanged, so ru needs
# no tokenizer variant (unlike zh) — just its table.
STOPWORDS_RU = frozenset(
    """и в не на я что он с как это а то все она так его но да ты к у же
    вы за бы по ее мне было вот от меня еще нет о из ему теперь когда уже
    для вас был него до кто чтобы мы тебя их чем была сам чтоб без будто
    человек чего раз тоже себе под жизнь будет тогда кого этот того потому
    этого какой ним здесь есть надо ней где мой почти мой тем нее сейчас
    были куда зачем всех можно при об хотя них более всегда конечно всю
    между это нас про они или если только себя том быть том""".split()
)

STOPWORDS_NL = frozenset(
    """de het een en van ik te dat die in is je niet zijn op aan met als
    voor had er maar om hem dan zou of wat mijn men dit zo door over ze
    zich bij ook tot je mij uit der daar haar naar heb hoe heeft hebben
    deze u want nog zal me zij nu ge geen omdat iets worden toch al waren
    veel meer doen toen moet ben zonder kan hun dus alles onder ja eens
    hier wie werd altijd doch wordt wezen kunnen ons zelf tegen na reeds
    wil kon niets uw iemand geweest andere""".split()
)

# Japanese (rules_v4): like zh, Japanese has no whitespace word
# boundaries, so ja stopword stats run on per-CHARACTER tokens — extended
# to the kana blocks (oracle/stats.tokenize_ja). The table is kana-only
# (particles and inflection characters): kanji are shared with Chinese,
# and keeping them out of the ja table keeps the zh/ja vote separable
# (ja text votes ja on its kana; zh text scores 0 here)
# [R: goose stopwords-ja — per-character candidate words like zh].
STOPWORDS_JA = frozenset(
    "の は に を が と で て も だ な い し た る か れ ら ず へ ば や "
    "よ ね う こ そ つ ん ま す り く き け お あ え".split()
)

# Arabic (rules_v4): space-separated like ru — table-only, no tokenizer
# variant (\w matches Arabic letters). Undiacritized forms, matching the
# tokenizer's output on real web text [R: goose stopwords-ar].
STOPWORDS_AR = frozenset(
    """في من على أن إلى عن مع هذا هذه ذلك التي الذي ما لا لم لن قد كان
    كانت كانوا يكون أو ثم حتى إذا كل بعض غير بين عند منذ حيث كما لكن هو
    هي هم أنا نحن أنت كيف أين متى لماذا هناك هنا ليس بعد قبل فوق تحت
    أمام حول دون ضد نحو عبر خلال بسبب رغم مثل أي بل إن لقد وقد فيه فيها
    عليه عليها إليه منه منها له لها بها به الى ان انه انها اذا هذة علي""".split()
)

STOPWORDS = {
    "en": STOPWORDS_EN,
    "fr": STOPWORDS_FR,
    "de": STOPWORDS_DE,
    "es": STOPWORDS_ES,
    "it": STOPWORDS_IT,
    "pt": STOPWORDS_PT,
    "zh": STOPWORDS_ZH,
    "ru": STOPWORDS_RU,
    "nl": STOPWORDS_NL,
    "ja": STOPWORDS_JA,
    "ar": STOPWORDS_AR,
}

# Deterministic vote order for language detection when no meta lang exists:
# earlier wins ties (en first keeps the pre-v2 "tie → en" behavior; new
# languages append so existing vote outcomes never flip on a tie).
VOTE_LANGS = ("en", "fr", "de", "es", "it", "pt", "zh", "ru", "nl", "ja",
              "ar")

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
