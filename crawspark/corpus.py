"""Deterministic synthetic corpus generator (FIXTURES.md §2).

All randomness comes from ``random.Random(seed ^ doc_index)`` — every
document is a pure function of (seed, index), so the same corpus can be
regenerated inside Spark executors without shipping data.

Two surfaces:
- ``make_doc(seed, i)``            → one interleaved document (dict).
- ``interleave_from_text(doc_id, text, lang)`` → deterministic HTML wrapping
  of a driver-testdata ``documents`` row (FIXTURES.md §3 usage mapping) so
  the sf* parquet tables can feed the extractor without external data.
"""

from __future__ import annotations

import random
import re
import zlib

# ---------------------------------------------------------------------------
# Word material. >=30% stopwords per FIXTURES.md §2.
# ---------------------------------------------------------------------------

_EN_CONTENT = (
    "market research signal growth archive pipeline cluster window policy "
    "report story village garden winter message question animal history "
    "science leader moment energy system related measure culture"
).split()
_EN_STOP = (
    "the of and to in a is that for it with as was on are this by be at "
    "from or an but not they which one all were we their been has will"
).split()
_FR_CONTENT = (
    "marche recherche signal croissance archive grappe fenetre politique "
    "rapport histoire village jardin hiver message question animal energie "
    "science culture mesure moment monde temps ville projet savoir"
).split()
_FR_STOP = (
    "le de la et les des en un une du dans est que pour qui sur pas plus "
    "par il au avec ne se ce son sont mais nous vous leur cette"
).split()

# rules_v2/v3 languages (opt-in via make_doc/make_corpus ``langs`` —
# the default ("en","fr") corpus stays byte-frozen). Stop pools draw
# from the shipped stopword tables so scoring sees realistic densities.
_DE_CONTENT = (
    "markt forschung signal wachstum archiv gruppe fenster politik bericht "
    "geschichte dorf garten winter nachricht frage tier energie wissen "
    "kultur leiter moment welt zeit stadt projekt".split())
_DE_STOP = ("der die das und in den von zu mit sich des auf ist im dem "
            "nicht ein eine als auch es an aus er hat dass sie nach bei "
            "einer um am sind noch wie einem".split())
_ES_CONTENT = (
    "mercado investigacion senal crecimiento archivo grupo ventana politica "
    "informe historia pueblo jardin invierno mensaje pregunta animal "
    "energia ciencia cultura lider momento mundo tiempo ciudad proyecto"
    .split())
_ES_STOP = ("de la que el en y a los del se las por un para con no una su "
            "al lo como mas pero sus le ya o este si porque esta entre"
            .split())
_IT_CONTENT = (
    "mercato ricerca segnale crescita archivio gruppo finestra politica "
    "rapporto storia paese giardino inverno messaggio domanda animale "
    "energia scienza cultura capo momento mondo tempo citta progetto"
    .split())
_IT_STOP = ("di a da in con su per tra il lo la i gli le un uno una che e "
            "non si sono come ma anche questo questa dei delle della del al"
            .split())
_PT_CONTENT = (
    "mercado pesquisa sinal crescimento arquivo grupo janela politica "
    "relatorio historia aldeia jardim inverno mensagem pergunta animal "
    "energia ciencia cultura lider momento mundo tempo cidade projeto"
    .split())
_PT_STOP = ("de a o que e do da em um para com nao uma os no se na por "
            "mais as dos como mas foi ao ele das tem seu sua ou ser".split())
_ZH_CONTENT = ("市场 研究 信号 增长 档案 集群 窗口 政策 报告 故事 村庄 花园 "
               "冬天 消息 问题 动物 历史 科学 领导 能源 系统 文化 世界 时间"
               .split())
_ZH_STOP = ("的 了 是 在 我 有 和 就 不 人 都 这 中 大 为 来 个 到 说 们 "
            "要 也 他 会 着 好 自 能 对 她".split())
# rules_v4: ja sentences join without spaces (kana particles are the
# stop pool — the per-character tokenizer's function chars); ar is
# space-separated like ru.
_JA_CONTENT = ("市場 研究 信号 成長 記録 集団 窓口 政策 報告 物語 村落 庭園 "
               "冬季 消息 問題 動物 歴史 科学 指導 資源 系統 文化 世界 時間"
               .split())
_JA_STOP = ("の は に を が と で て も だ な い し た る か れ ら "
            "へ ば や よ ね う こ そ つ ん".split())
_AR_CONTENT = ("سوق بحث إشارة نمو أرشيف مجموعة نافذة سياسة تقرير قصة قرية "
               "حديقة شتاء رسالة سؤال حيوان طاقة علم ثقافة قائد لحظة عالم "
               "وقت مدينة مشروع".split())
_AR_STOP = ("في من على أن إلى عن مع هذا هذه ذلك التي الذي ما لا كان كانت "
            "أو ثم كل بين عند حيث كما لكن هو هي هم هناك بعد قبل".split())

# rules_v5 pools: ko/tr/pl/id/hi/vi — all space-separated scripts for
# the \w tokenizer (hi via the stats.py Devanagari matra fix).
_KO_CONTENT = ("시장 연구 신호 성장 기록 집단 창문 정책 보고서 이야기 "
               "마을 정원 겨울 소식 질문 동물 역사 과학 지도자 에너지 "
               "체계 문화 세계 시간".split())
_KO_STOP = ("그 이 저 것 수 등 그리고 그러나 하지만 때문에 위해 대한 "
            "함께 모든 어떤 다른 많은 같은 있다 있는 한다 하는 것이 "
            "경우 중 지금 바로".split())
_TR_CONTENT = ("pazar arastirma sinyal buyume arsiv grup pencere politika "
               "rapor hikaye koy bahce kis mesaj soru hayvan enerji bilim "
               "kultur lider an dunya zaman sehir proje".split())
_TR_STOP = ("ve bir bu da de için ile olarak daha çok en gibi kadar sonra "
            "ama her değil ne var olan göre böyle bazı aynı kendi ki "
            "çünkü yani".split())
_PL_CONTENT = ("rynek badanie sygnal wzrost archiwum grupa okno polityka "
               "raport historia wioska ogrod zima wiadomosc pytanie "
               "zwierze energia nauka kultura lider chwila swiat czas "
               "miasto projekt".split())
_PL_STOP = ("i w na z do że się nie jest to jak po co za od o ale czy "
            "dla przy już tylko są ich ta ten gdzie bardzo też "
            "przez".split())
_ID_CONTENT = ("pasar penelitian sinyal pertumbuhan arsip kelompok "
               "jendela kebijakan laporan cerita desa kebun dingin pesan "
               "pertanyaan hewan energi ilmu budaya pemimpin saat dunia "
               "waktu kota proyek".split())
_ID_STOP = ("yang dan di ke dari untuk pada dengan ini itu adalah akan "
            "tidak ada atau juga karena dalam oleh seperti tentang lebih "
            "hanya banyak semua bahwa".split())
_HI_CONTENT = ("बाजार शोध संकेत विकास संग्रह समूह खिड़की नीति रिपोर्ट "
               "कहानी गाँव बगीचा सर्दी संदेश सवाल जानवर ऊर्जा विज्ञान "
               "संस्कृति नेता क्षण दुनिया समय शहर परियोजना".split())
_HI_STOP = ("के का की को में ने से पर है हैं था थी थे और या भी नहीं तो "
            "ही यह वह इस उस एक कुछ सब जो जब बहुत साथ लिए".split())
_VI_CONTENT = ("chợ nghiên cứu tín hiệu tăng trưởng kho nhóm cửa sổ "
               "chính sách báo cáo chuyện làng vườn đông tin câu hỏi "
               "vật sử khoa học văn hóa thời gian thành phố dự án".split())
_VI_STOP = ("của và các có trong là cho không được người một những với "
            "khi này đã sẽ về như từ nhưng cũng rất nhiều đến theo".split())

_WORDS = {
    "en": None,  # resolved in _sentence (frozen en/fr fast path)
    "de": (_DE_CONTENT, _DE_STOP),
    "es": (_ES_CONTENT, _ES_STOP),
    "it": (_IT_CONTENT, _IT_STOP),
    "pt": (_PT_CONTENT, _PT_STOP),
    "zh": (_ZH_CONTENT, _ZH_STOP),
    "ja": (_JA_CONTENT, _JA_STOP),
    "ar": (_AR_CONTENT, _AR_STOP),
    "ko": (_KO_CONTENT, _KO_STOP),
    "tr": (_TR_CONTENT, _TR_STOP),
    "pl": (_PL_CONTENT, _PL_STOP),
    "id": (_ID_CONTENT, _ID_STOP),
    "hi": (_HI_CONTENT, _HI_STOP),
    "vi": (_VI_CONTENT, _VI_STOP),
}

_AD_TOKENS = ["sidebar", "advert", "sponsor", "footer-links", "nav-menu",
              "share-toolbar", "comment-box", "newsletter-promo"]
_GOOD_IMGS = ["photo_{i}.jpg", "figure-{i}.png", "chart{i}.jpeg"]
_BAD_IMGS = ["twitter.jpg", "spacer.gif", "btn_submit.png", "pixel-1x1.png",
             "logo_site.png"]
_SITES = ["Example Times", "La Gazette", "Tech Journal", "Daily Signal"]
_VIDEO_URLS = [
    "https://www.youtube.com/embed/vid{i}",
    "https://player.vimeo.com/video/9{i}",
    "https://www.dailymotion.com/embed/video/x{i}",
]


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    # frozen v1 path: en uses the en pools, ANY other lang used the fr
    # pools — preserved byte-for-byte for en/fr corpora; the v4 languages
    # resolve their own pools via _WORDS.
    pools = _WORDS.get(lang)
    if pools is None:
        content = _EN_CONTENT if lang == "en" else _FR_CONTENT
        stop = _EN_STOP if lang == "en" else _FR_STOP
    else:
        content, stop = pools
    words = []
    for _ in range(n_words):
        pool = stop if rng.random() < 0.45 else content
        words.append(rng.choice(pool))
    if lang in ("zh", "ja"):
        return "".join(words) + "。"  # CJK: no whitespace word boundaries
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, lang: str, n_sent: int | None = None) -> str:
    n = n_sent if n_sent is not None else rng.randint(2, 5)
    return " ".join(_sentence(rng, lang, rng.randint(8, 18)) for _ in range(n))


# ---------------------------------------------------------------------------
# HTML grammar (FIXTURES.md §2 bullet 1)
# ---------------------------------------------------------------------------

def make_html(rng: random.Random, lang: str, title_words: str,
              n_paras: int | None = None, with_media: bool = True) -> str:
    site = rng.choice(_SITES)
    splitter = rng.choice([" | ", " - ", " » "])
    title = f"{title_words}{splitter}{site}"
    k = n_paras if n_paras is not None else rng.randint(1, 12)
    parts = [
        "<!DOCTYPE html><html lang=%s><head>" % lang,
        '<meta charset="utf-8">',
        f"<title>{title}</title>",
        f'<meta name="description" content="{_sentence(rng, lang, 10)}">',
    ]
    if rng.random() < 0.5:
        parts.append('<base href="http://example.com/articles/">')
    parts.append("</head><body>")
    # nav boilerplate
    parts.append('<div class="nav-menu"><ul>' + "".join(
        f'<li><a href="/s{j}">{rng.choice(_EN_CONTENT)}</a></li>'
        for j in range(rng.randint(3, 6))) + "</ul></div>")
    parts.append('<div id="content" class="article-body">')
    parts.append(f"<h1>{title_words}</h1>")
    media_budget = rng.randint(0, 3) if with_media else 0
    video_budget = 1 if (with_media and rng.random() < 0.35) else 0
    for p in range(k):
        parts.append(f"<p>{_paragraph(rng, lang)}</p>")
        if rng.random() < 0.25:  # interspersed ad/sidebar div
            parts.append(
                f'<div class="{rng.choice(_AD_TOKENS)}">'
                f"{_sentence(rng, lang, 6)} "
                f'<a href="http://adserver.example/{p}">click</a></div>'
            )
        if media_budget and rng.random() < 0.4:
            media_budget -= 1
            if rng.random() < 0.4:
                img = rng.choice(_BAD_IMGS)
            else:
                img = rng.choice(_GOOD_IMGS).format(i=p)
            parts.append(
                f'<img src="img/{img}" alt="{rng.choice(_EN_CONTENT)}" '
                f'width="{rng.choice([32, 480, 640])}" height="360">'
            )
        if video_budget and rng.random() < 0.3:
            video_budget -= 1
            parts.append(
                f'<iframe src="{rng.choice(_VIDEO_URLS).format(i=p)}" '
                'width="560" height="315"></iframe>'
            )
    parts.append("</div>")
    parts.append('<div class="footer-links">' + " ".join(
        f'<a href="/f{j}">{rng.choice(_EN_CONTENT)}</a>'
        for j in range(rng.randint(2, 5))) + "</div>")
    parts.append("</body></html>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# PDF generator (FIXTURES.md §2 bullet 2)
# ---------------------------------------------------------------------------

def make_pdf(rng: random.Random, lang: str, n_pages: int | None = None,
             flate: bool | None = None, ascii_filter: str = "") -> str:
    """Minimal valid PDF as a latin-1-mapped string.

    ``ascii_filter`` ∈ {"", "hex", "a85"} wraps each content stream in
    ASCIIHexDecode / ASCII85Decode (applied AFTER optional Flate, so the
    parser must run the /Filter chain in order). Defaults leave the
    rng-driven v1 output byte-identical (frozen fixtures)."""
    import base64

    n_pages = n_pages if n_pages is not None else rng.randint(1, 3)
    flate = flate if flate is not None else (rng.random() < 0.5)
    objs: list[bytes] = []
    page_ids = [3 + 2 * p for p in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(
        f"2 0 obj\n<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>\nendobj\n"
        .encode("latin-1"))
    for p, pid in enumerate(page_ids):
        cid = pid + 1
        lines = [_sentence(rng, lang, rng.randint(6, 12))
                 for _ in range(rng.randint(2, 5))]
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            if j == 0:
                ops.append(f"({esc}) Tj")
            else:
                ops.append(f"0 -14 TD ({esc}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        filt = b""
        if flate:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        if ascii_filter == "hex":
            stream = stream.hex().upper().encode("ascii") + b">"
            filt = (b"/Filter [/ASCIIHexDecode /FlateDecode] " if flate
                    else b"/Filter /ASCIIHexDecode ")
        elif ascii_filter == "a85":
            stream = base64.a85encode(stream) + b"~>"
            filt = (b"/Filter [/ASCII85Decode /FlateDecode] " if flate
                    else b"/Filter /ASCII85Decode ")
        objs.append(
            f"{pid} 0 obj\n<< /Type /Page /Parent 2 0 R /Contents {cid} 0 R "
            ">>\nendobj\n".encode("latin-1"))
        objs.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (cid, filt, len(stream))
            + stream + b"\nendstream\nendobj\n")
    body = b"%PDF-1.4\n" + b"".join(objs) + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return body.decode("latin-1")


# ---------------------------------------------------------------------------
# Document-level assembly
# ---------------------------------------------------------------------------

def make_doc(seed: int, i: int, heavy_tail: bool = False,
             min_paras: int = 1, max_paras: int = 12,
             langs: tuple = ("en", "fr")) -> dict:
    """One interleaved document — pure function of (seed, i, langs).

    min/max_paras control document weight: defaults give small fixture
    docs; bench corpora use 15-45 (≈10-40 KB — realistic web pages).
    ``langs`` opts into a multilingual corpus (uniform pick); the default
    ("en","fr") keeps the v1 75/25 split and rng stream byte-frozen."""
    rng = random.Random(seed ^ i)
    doc_id = f"d{seed}-{i:012d}"
    if langs == ("en", "fr"):
        lang = "fr" if rng.random() < 0.25 else "en"
    else:
        lang = langs[min(int(rng.random() * len(langs)), len(langs) - 1)]
    roll = rng.random()
    spans: list[dict] = []
    if roll < 0.78:  # html doc
        n_paras = rng.randint(min_paras, max_paras)
        if heavy_tail and rng.random() < 0.001:
            n_paras = max_paras * 33  # 100x-median heavy tail (FIXTURES.md §2)
        html = make_html(rng, lang, _sentence(rng, lang, 6)[:-1], n_paras)
        if rng.random() < 0.15:  # multi-chunk html
            cut = len(html) // 2
            spans.append({"kind": "html", "text": html[:cut],
                          "media_ref": None, "offset": 0})
            spans.append({"kind": "html", "text": html[cut:],
                          "media_ref": None, "offset": 1})
        else:
            spans.append({"kind": "html", "text": html,
                          "media_ref": None, "offset": 0})
    elif roll < 0.90:  # pdf doc
        # PDF literal strings are latin-1 byte streams in our model (CID
        # fonts for CJK/Arabic are a documented parse gap) — zh/ja/ar
        # PDFs fall back to English body text, like real sites serving
        # latin PDFs alongside non-latin HTML.
        # (rules_v5 extends the fallback to every language whose script
        # or diacritics exceed latin-1: ko/hi non-latin, tr/pl/vi carry
        # characters outside the latin-1 repertoire)
        pdf_lang = ("en" if lang in ("zh", "ja", "ar", "ko", "hi",
                                     "tr", "pl", "vi") else lang)
        spans.append({"kind": "pdf",
                      "text": make_pdf(rng, pdf_lang),
                      "media_ref": None, "offset": 0})
    else:  # plain text doc
        spans.append({"kind": "text", "text": _paragraph(rng, lang, 4),
                      "media_ref": None, "offset": 0})
    # optional interleaved media spans
    for k in range(rng.randint(0, 2)):
        ext = rng.choice(["jpg", "png", "mp4"])
        spans.append({
            "kind": "media",
            "text": _sentence(rng, lang, 4) if rng.random() < 0.5 else "",
            "media_ref": f"img://{doc_id}/{k}.{ext}",
            "offset": len(spans),
        })
    return {"doc_id": doc_id, "spans": spans}


def make_corpus(n_docs: int, seed: int = 42, heavy_tail: bool = False,
                min_paras: int = 1, max_paras: int = 12,
                langs: tuple = ("en", "fr")):
    """Yield interleaved documents deterministically."""
    for i in range(n_docs):
        yield make_doc(seed, i, heavy_tail, min_paras, max_paras, langs)


# Per-language stopword scaffolds for weaving driver-row word soup into
# stopword-rich sentences (en/fr lists byte-frozen from v1; de/es/it/pt/zh
# added with rules_v2 so the driver corpus exercises every stopword table
# [R: goose honors the page-declared language when it ships a stopword
# list — stopwords-<lang>.txt]). zh tokens are function CHARACTERS (the
# zh tokenizer is per-character; see oracle/stats.tokenize_zh).
_SCAFFOLDS = {
    "en": ["the", "{w}", "of", "the", "{w}", "was", "in", "the", "{w}",
           "and", "it", "had", "a", "{w}", "for", "all", "of", "the",
           "{w}", "there"],
    "fr": ["le", "{w}", "de", "la", "{w}", "est", "dans", "le", "{w}",
           "et", "il", "a", "un", "{w}", "pour", "tous", "les", "{w}"],
    "de": ["der", "{w}", "und", "die", "{w}", "ist", "in", "dem", "{w}",
           "mit", "es", "war", "ein", "{w}", "für", "alle", "von", "den",
           "{w}", "hier"],
    "es": ["el", "{w}", "de", "la", "{w}", "es", "en", "el", "{w}",
           "y", "se", "fue", "un", "{w}", "para", "todos", "los",
           "{w}", "donde"],
    "it": ["il", "{w}", "di", "la", "{w}", "è", "in", "il", "{w}",
           "e", "si", "era", "un", "{w}", "per", "tutti", "i",
           "{w}", "dove"],
    "pt": ["o", "{w}", "de", "a", "{w}", "é", "em", "o", "{w}",
           "e", "se", "foi", "um", "{w}", "para", "muito", "os",
           "{w}", "quando"],
    "zh": ["的", "{w}", "了", "是", "在", "{w}", "我", "有", "和", "就",
           "{w}", "不", "人", "都", "这", "{w}", "中", "上", "个",
           "{w}", "到"],
    "ru": ["и", "{w}", "в", "не", "{w}", "на", "что", "он", "с", "{w}",
           "как", "это", "а", "{w}", "то", "все", "по", "{w}", "же"],
    "nl": ["de", "{w}", "het", "een", "{w}", "en", "van", "dat", "{w}",
           "die", "in", "is", "op", "{w}", "aan", "met", "voor",
           "{w}", "er"],
    # ja scaffold chars are the per-character tokenizer's function chars
    # (joined with spaces here; the kana tokens match regardless)
    "ja": ["の", "{w}", "は", "に", "{w}", "を", "が", "と", "{w}",
           "で", "て", "も", "{w}", "だ", "な", "し", "{w}", "た"],
    "ar": ["في", "{w}", "من", "على", "{w}", "أن", "إلى", "عن", "{w}",
           "مع", "هذا", "كان", "{w}", "كل", "التي", "الذي", "{w}",
           "هناك"],
    # rules_v5 scaffolds: every literal token below is in the language's
    # stopword table, so scaffolded sentences carry real stopword density
    "ko": ["그", "{w}", "이", "그리고", "{w}", "모든", "것이", "있다",
           "{w}", "때문에", "위해", "함께", "{w}", "있는", "경우",
           "지금", "{w}", "바로"],
    "tr": ["ve", "{w}", "bir", "bu", "{w}", "için", "ile", "daha",
           "{w}", "çok", "gibi", "sonra", "{w}", "her", "değil", "olan",
           "{w}", "kadar"],
    "pl": ["i", "{w}", "w", "na", "{w}", "że", "się", "nie", "{w}",
           "jest", "to", "jak", "{w}", "dla", "ale", "przez", "{w}",
           "bardzo"],
    "id": ["yang", "{w}", "dan", "di", "{w}", "untuk", "pada", "dengan",
           "{w}", "ini", "adalah", "akan", "{w}", "juga", "dalam",
           "karena", "{w}", "semua"],
    "hi": ["के", "{w}", "में", "और", "{w}", "है", "था", "पर", "{w}",
           "यह", "से", "भी", "{w}", "तो", "सब", "साथ", "{w}", "लिए"],
    "vi": ["của", "{w}", "và", "các", "{w}", "có", "trong", "là", "{w}",
           "cho", "không", "được", "{w}", "một", "những", "với", "{w}",
           "này"],
}


def interleave_from_text(doc_id, text: str, lang: str) -> dict:
    """Deterministic interleaved wrapping of a driver ``documents`` row
    (FIXTURES.md §3): HTML synthesized as a pure function of the row."""
    i = int(doc_id)
    rng = random.Random(0xC0FFEE ^ i)
    lang = lang if lang in _SCAFFOLDS else "en"
    gen_lang = lang if lang in ("en", "fr") else "en"  # _paragraph material
    body_text = " ".join((text or "").split()) or _paragraph(rng, gen_lang, 2)
    words = body_text.split()
    title_words = " ".join(words[:6]) if words else "untitled"
    # Weave row tokens into stopword-scaffolded sentences (the raw testdata
    # text is stopword-poor word soup, which the scorer rightly rejects as
    # boilerplate) — deterministic function of the row.
    scaffold = _SCAFFOLDS[lang]
    sentences = []
    wi = 0
    while wi < len(words):
        parts = []
        for tok in scaffold:
            if tok == "{w}":
                parts.append(words[wi % len(words)])
                wi += 1
            else:
                parts.append(tok)
        sentences.append(" ".join(parts) + ".")
        if wi >= len(words):
            break
    # ~3 sentences per paragraph.
    paras = [" ".join(sentences[j:j + 3])
             for j in range(0, len(sentences), 3)] or [body_text]
    site = _SITES[i % len(_SITES)]
    parts = [
        f'<html lang="{lang}"><head><meta charset="utf-8">',
        f"<title>{title_words} | {site}</title>",
    ]
    # deterministic publish date on ~2/3 of docs (article:published_time is
    # the top-priority known tag — exercises extract_publish_date end to
    # end; the remaining third pins the empty-date path)
    if i % 3 != 2:
        parts.append(f'<meta property="article:published_time" '
                     f'content="2026-{1 + i % 12:02d}-{1 + i % 28:02d}'
                     f'T{i % 24:02d}:00:00Z">')
    parts.append("</head><body>")
    parts.append('<div class="nav-menu"><a href="/a">home</a> '
                 '<a href="/b">news</a></div>')
    parts.append('<div id="content" class="article-body">')
    for j, p in enumerate(paras):
        if (i + j) % 4 == 0:
            # one short IN-CONTENT anchor per 4th paragraph (deterministic
            # host from row words): survives the link-density gate inside a
            # long paragraph and gives extract_outlinks / outlink_domains a
            # real per-doc surface (driver corpus was outlink-free before)
            # words is never empty: body_text falls back to a generated
            # paragraph above
            w = re.sub(r"[^a-z0-9]", "",
                       words[(j * 5) % len(words)].lower()) or "link"
            p = f'{p} <a href="http://{w}.example.org/d{i}p{j}">{w}</a>'
        parts.append(f"<p>{p}</p>")
        if j == 0 and i % 3 == 0:
            parts.append(f'<img src="http://example.com/img/photo_{i}.jpg" '
                         f'alt="fig" width="640" height="360">')
    parts.append("</div>")
    # rel=tag bar OUTSIDE the content div (where real sites keep it and
    # exactly what the cleaner strips — extract_tags reads pre-clean); tag
    # words derive from the row deterministically
    if i % 2 == 0 and words:
        tag_words = [words[k % len(words)] for k in (0, 7)]
        parts.append('<div class="tag-bar">' + " ".join(
            f'<a rel="tag" href="/tag/{w}">{w}</a>'
            for w in dict.fromkeys(tag_words)) + "</div>")
    parts.append('<div class="footer-links"><a href="/c">contact</a></div>')
    parts.append("</body></html>")
    return {
        "doc_id": str(doc_id),
        "spans": [{"kind": "html", "text": "".join(parts),
                   "media_ref": None, "offset": 0}],
    }
