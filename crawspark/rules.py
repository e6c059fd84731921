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

RULES_VERSION = "rules_v5"  # v2: +de/es/it/pt/zh; v3: +ru/nl; v4: +ja/ar; v5: +ko/tr/pl/id/hi/vi

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

# --- rules_v5: ko/tr/pl/id/hi/vi — the largest remaining real-web
# languages after ja/ar, all table-only (no tokenizer variant needed:
# Hangul syllables, Turkish/Polish/Vietnamese precomposed latin and
# Devanagari — via the stats.py matra fix — all survive \w intact).

# Korean agglutinates particles onto the preceding word, so the table
# holds forms that DO occur space-separated in real text: determiners,
# conjunctions, light verbs, bound nouns [R: goose stopwords-ko].
STOPWORDS_KO = frozenset(
    """이 그 저 것 수 등 및 더 안 못 잘 또 또는 또한 그리고 그러나 하지만
    그래서 그런데 때문에 위해 위한 대한 대해 통해 따라 함께 모든 어떤
    이런 그런 저런 다른 많은 같은 가장 매우 바로 거의 이제 지금 우리
    너무 있다 있는 있었다 없다 없는 한다 하는 했다 하고 된다 되는 됐다
    것이 것은 것을 경우 중 후 전 때 좀 덜 왜 누가 무엇 어디 언제""".split()
)

STOPWORDS_TR = frozenset(
    """ve bir bu da de için ile olarak daha çok en gibi kadar sonra önce
    ama ancak fakat veya ya ise değil her hiç şey ben sen o biz siz onlar
    ne nasıl neden hangi kim mi mı mu mü var yok olan oldu olur olmak
    etti eder yapılan üzere göre karşı arasında içinde dışında üzerinde
    altında böyle şöyle öyle bütün bazı birçok birkaç aynı diğer başka
    kendi onun bunun benim senin bizim sizin şu ki eğer çünkü yani artık
    bile zaten belki tüm tek iki üç yıl gün zaman yer""".split()
)

STOPWORDS_PL = frozenset(
    """i w na z do że się nie jest to jak po co za od o ale czy dla przy
    już tylko może być był była było są będzie ich jego jej nas was ta
    ten te tym tego tej która który które gdzie kiedy bardzo też także
    oraz lub albo ani bez pod nad przez między więc jednak żeby aby gdy
    bo ponieważ wszystko nic coś ktoś nikt każdy inny taki tam tu teraz
    potem wtedy jeszcze właśnie nawet można trzeba mamy mają miał we ze
    u mnie ciebie nim niej nich swoje swój roku lat dnia""".split()
)

STOPWORDS_ID = frozenset(
    """yang dan di ke dari untuk pada dengan ini itu adalah akan tidak
    ada atau juga saya kamu dia kami kita mereka bisa harus sudah belum
    masih telah dalam oleh karena jika kalau seperti sebagai antara
    tentang terhadap namun tetapi tapi serta agar supaya sehingga yaitu
    bahwa para lebih sangat paling hanya saja pun lagi sekali banyak
    semua setiap beberapa ialah bukan begitu demikian maka lalu kemudian
    saat ketika hingga sampai sejak secara bagi tanpa melalui""".split()
)

# Hindi: Devanagari matras are combining marks, kept whole by the
# stats.py tokenizer block fix — forms below are real postpositions,
# auxiliaries and pronouns as written [R: goose stopwords-hi].
STOPWORDS_HI = frozenset(
    """के का की को में ने से पर है हैं था थी थे हो होता होती होते और या
    भी नहीं तो ही यह वह ये वे इस उस एक दो अपने अपना अपनी कुछ सब सभी कोई
    किसी जो जब तब क्यों कैसे कहाँ अब फिर बहुत अधिक कम साथ बाद पहले लिए
    गया गयी गये करना करता करती करते किया हुआ हुई हुए कहा लेकिन मगर अगर
    क्योंकि इसलिए तक भीतर बाहर ऊपर नीचे बीच बिना द्वारा तरह ओर वाला वाली
    वाले रहा रही रहे दिया सकता सकती सकते चाहिए""".split()
)

# Vietnamese: precomposed NFC forms (real web text is NFC; NFD would
# shatter on \w like any combining sequence).
STOPWORDS_VI = frozenset(
    """của và các có trong là cho không được người một những với khi này
    đã sẽ về như từ nhưng cũng rất nhiều đến theo tại ra nếu vì sau
    trước trên dưới giữa bằng hoặc hay thì mà nên phải đang bị ở lại còn
    chỉ rồi đây đó nào ai gì sao bao giờ nơi việc điều cả mọi mỗi từng
    vào nữa thêm luôn đều chưa sự làm để khác nhau chúng tôi bạn họ nó
    mình ông bà anh chị em""".split()
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
    "ko": STOPWORDS_KO,
    "tr": STOPWORDS_TR,
    "pl": STOPWORDS_PL,
    "id": STOPWORDS_ID,
    "hi": STOPWORDS_HI,
    "vi": STOPWORDS_VI,
}

# Deterministic vote order for language detection when no meta lang exists:
# earlier wins ties (en first keeps the pre-v2 "tie → en" behavior; new
# languages append so existing vote outcomes never flip on a tie).
VOTE_LANGS = ("en", "fr", "de", "es", "it", "pt", "zh", "ru", "nl", "ja",
              "ar", "ko", "tr", "pl", "id", "hi", "vi")

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
