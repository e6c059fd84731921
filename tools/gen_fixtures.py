"""Generate golden span-sequence fixtures (SURVEY.md §5.2.1, FIXTURES.md §1.2).

Writes tests/fixtures/{case}/input.json + expected.json. Run ONCE, review,
commit; goldens are then FROZEN (regenerate only on a deliberate,
fixture-versioned rule change — rules_v1 pinned in crawspark.rules).

Usage: python tools/gen_fixtures.py
"""

from __future__ import annotations

import json
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from crawspark.corpus import make_corpus, make_pdf  # noqa: E402
from crawspark.oracle import extract_document  # noqa: E402

FIXDIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

LOREM_EN = ("the market was open and all of the people were there for it "
            "with a question about the energy of the village and the story "
            "of the winter that they all shared in the garden. ")


def handcrafted() -> dict[str, list[dict]]:
    """Edge cases from FIXTURES.md §1.2 not guaranteed by the grammar."""
    para = f"<p>{LOREM_EN}</p>"
    cases: dict[str, list[dict]] = {}

    def html_case(name: str, html: str) -> None:
        cases[name] = [{"kind": "html", "text": html, "media_ref": None,
                        "offset": 0}]

    html_case("plain_article",
              "<html><head><title>A Story of the Village | Example Times"
              "</title></head><body><div id='content' class='article-body'>"
              + para * 3 + "</div></body></html>")
    html_case("highlink_trap",
              "<html><head><title>Links</title></head><body>"
              "<div id='content' class='article-body'>" + para * 2
              + "</div><div id='morelinks'><p>"
              + " ".join(f"<a href='/l{i}'>the link {i} here</a>" for i in range(20))
              + "</p></div></body></html>")
    html_case("sibling_merge",
              "<html><head><title>Sib</title></head><body>"
              f"<div id='lead'><p>{LOREM_EN * 2}</p></div>"
              "<div id='content' class='article-body'>" + para * 4
              + "</div></body></html>")
    html_case("em_strong_unwrap",
              "<html><head><title>Emph</title></head><body>"
              "<div id='content' class='article-body'><p>the <em>market</em> "
              "was <strong>open</strong> and all of the people were there "
              "for it with a question about the energy of it all.</p>"
              + para + "</div></body></html>")
    html_case("div_to_p",
              "<html><head><title>DivP</title></head><body>"
              "<div id='content' class='article-body'><div>" + LOREM_EN * 2
              + "</div>" + para + "</div></body></html>")
    html_case("title_splitters",
              "<html><head><title>Short » A Very Long Descriptive Article "
              "Title Here</title></head><body><div id='content' "
              "class='article-body'>" + para * 2 + "</div></body></html>")
    html_case("meta_lang_fr",
              "<html><head><title>Titre</title>"
              "<meta http-equiv='content-language' content='fr-FR'>"
              "</head><body><div id='content' class='article-body'>"
              "<p>le marche est dans la ville et les gens sont pour le "
              "projet avec une question sur la culture et le temps de la "
              "ville et de la science pour tous.</p></div></body></html>")
    html_case("banned_images",
              "<html><head><title>Imgs</title></head><body>"
              "<div id='content' class='article-body'>" + para
              + "<img src='img/twitter.jpg' width='480' height='360'>"
              "<img src='img/photo_1.jpg' alt='good' width='480' height='360'>"
              "<img src='img/tiny.jpg' width='20' height='20'>"
              + para + "</div></body></html>")
    html_case("video_iframe",
              "<html><head><title>Vid</title>"
              "<base href='http://example.com/a/'></head><body>"
              "<div id='content' class='article-body'>" + para
              + "<iframe src='https://www.youtube.com/embed/abc123'></iframe>"
              "<iframe src='https://evil.example/embed/x'></iframe>"
              + para + "</div></body></html>")
    html_case("relative_urls",
              "<html><head><title>Rel</title>"
              "<base href='http://example.com/sub/dir/'></head><body>"
              "<div id='content' class='article-body'>" + para
              + "<img src='../img/photo.jpg' width='480' height='360'>"
              "</div></body></html>")
    cases["empty_payload"] = [
        {"kind": "html", "text": "", "media_ref": None, "offset": 0}]
    cases["garbage_payload"] = [
        {"kind": "html", "text": "\x00\x01 not html at all }{",
         "media_ref": None, "offset": 0}]
    html_case("wrong_charset",
              "<html><head><meta charset='utf-8'><title>Enc</title></head>"
              "<body><div id='content' class='article-body'><p>the cafÃ© "
              "was open and all of the people were there for it with a "
              "question about the energy of the day.</p></div></body></html>")
    full = ("<html><head><title>Chunks | Site</title></head><body>"
            "<div id='content' class='article-body'>" + para * 3
            + "</div></body></html>")
    cut = len(full) // 2
    cases["multi_chunk_html"] = [
        {"kind": "html", "text": full[:cut], "media_ref": None, "offset": 0},
        {"kind": "html", "text": full[cut:], "media_ref": None, "offset": 1},
    ]
    rng = random.Random(99)
    cases["pdf_single_page"] = [
        {"kind": "pdf", "text": make_pdf(rng, "en", n_pages=1, flate=False),
         "media_ref": None, "offset": 0}]
    cases["pdf_multi_page_flate"] = [
        {"kind": "pdf", "text": make_pdf(rng, "en", n_pages=3, flate=True),
         "media_ref": None, "offset": 0}]
    # r4: ASCII transport filters (ASCIIHexDecode raw; ASCII85Decode
    # chained after Flate — the parser must apply /Filter in order).
    cases["pdf_asciihex"] = [
        {"kind": "pdf",
         "text": make_pdf(random.Random(77), "en", n_pages=1, flate=False,
                          ascii_filter="hex"),
         "media_ref": None, "offset": 0}]
    cases["pdf_ascii85_flate"] = [
        {"kind": "pdf",
         "text": make_pdf(random.Random(78), "fr", n_pages=2, flate=True,
                          ascii_filter="a85"),
         "media_ref": None, "offset": 0}]
    cases["interleaved_media"] = [
        {"kind": "html", "text": full, "media_ref": None, "offset": 0},
        {"kind": "media", "text": "a caption", "media_ref": "img://m/0.jpg",
         "offset": 1},
        {"kind": "media", "text": "", "media_ref": "img://m/1.mp4",
         "offset": 2},
    ]
    cases["text_only"] = [
        {"kind": "text", "text": "  plain   text payload\n with spaces ",
         "media_ref": None, "offset": 0}]

    # --- torture cases (markup recovery) ---
    html_case("torture_nested_table",
              "<html><head><title>Tbl</title></head><body>"
              "<div id='content' class='article-body'>" + para
              + "<table><tr><td>" + LOREM_EN + "</td><td><table><tr><td>"
              "inner cell</td></tr></table></td></tr></table>"
              "</div></body></html>")
    html_case("torture_unclosed_tags",
              "<html><head><title>Unclosed</title></head><body>"
              "<div id='content' class='article-body'><p>" + LOREM_EN
              + "<p>" + LOREM_EN + "<div>" + LOREM_EN * 2
              + "</body></html>")
    html_case("torture_attr_quoting",
              "<html><head><title>Attrs</title></head><body>"
              "<div id='content' class='article-body'>"
              '<p data-x="a\'b" data-y=unquoted data-z>' + LOREM_EN + "</p>"
              "<img src='we ird name.jpg' width='640' height=\"480\">"
              "</div></body></html>")
    html_case("torture_unicode",
              "<html><head><title>Ünïcodé — Tïtle</title></head><body>"
              "<div id='content' class='article-body'><p>the café and the "
              "naïve résumé of the œuvre were all of the things that they "
              "had in the little village for the winter.</p>"
              "<p>数据 données データ the data of the world was all there "
              "for them in the system of the archive they all shared.</p>"
              "</div></body></html>")
    html_case("torture_deep_nesting",
              "<html><head><title>Deep</title></head><body>"
              "<div id='content' class='article-body'>"
              + "<div>" * 30 + "<p>" + LOREM_EN + "</p>" + "</div>" * 30
              + para + "</div></body></html>")
    html_case("torture_entities",
              "<html><head><title>A &amp; B</title></head><body>"
              "<div id='content' class='article-body'><p>the &quot;data&quot;"
              " &lt;tag&gt; was &amp; is all of the things for the people "
              "of the village in the winter of the year.</p></div>"
              "</body></html>")
    # --- multilingual cases (rules_v2: de/es/it/pt/zh stopword tables) ---
    # One meta-declared and one vote-only (no lang attribute) page per
    # language: the meta case pins scoring under the declared language's
    # stopword table; the vote case pins detect_lang's stopword vote.
    LOREM = {
        "de": ("der markt war in dem dorf und alle von den leuten waren "
               "hier mit einer frage über die energie und die geschichte "
               "von dem winter die sie alle in dem garten hatten. "),
        "es": ("el mercado fue en el pueblo y todos los que estaban alli "
               "tenian una pregunta sobre la energia de la historia y el "
               "invierno que se compartia en el jardin para todos. "),
        "it": ("il mercato era in il paese e tutti i che erano la avevano "
               "una domanda su la energia di la storia e il inverno che si "
               "divideva in il giardino per tutti quanti. "),
        "pt": ("o mercado foi em a aldeia e os que estavam la tinham uma "
               "pergunta sobre a energia de a historia e o inverno que se "
               "partilhava em o jardim para quem estava. "),
        "zh": ("这个市场是在村里的地方了我们都有一个问题是关于能源的历史和冬天"
               "的故事就在花园里的人都到了这里上面有很多的人了。"),
        "ru": ("и рынок был в деревне не на месте что он с вопросом как "
               "это а история то все она так его энергия но да зима к "
               "саду у же все вы за столом бы по дороге. "),
        "nl": ("de markt was in het dorp een vraag en de mensen van dat "
               "die in de tuin is je verhaal niet zijn op de winter aan "
               "de energie met als voor had er maar om hem dan. "),
        # rules_v4: ja (kana-heavy, no whitespace — per-character
        # tokenizer over kana + Han) and ar (space-separated, RTL script)
        "ja": ("この市場は村の中にあって人々はみなそこにいたのでエネルギーの"
               "話と冬の物語を庭で共有していたのだということがあるのです。"
               "研究の報告はその世界の歴史と文化の問題についてのものだった。"),
        "ar": ("كان السوق في القرية وكان كل الناس هناك مع سؤال عن الطاقة "
               "من التاريخ في الشتاء الذي كانوا يتشاركونه في الحديقة مع "
               "الجميع وكانت القصة عن العالم والثقافة في ذلك الوقت. "),
        # rules_v5: ko/tr/pl/id/hi/vi — all table-only (Hangul,
        # precomposed latin and Devanagari survive the tokenizer whole;
        # hi relies on the stats.py matra block fix)
        "ko": ("그 시장은 마을 안에 있었다 그리고 모든 사람들이 함께 "
               "그곳에 있다 이야기 때문에 우리 모두 같은 질문을 했다 "
               "겨울 정원 위해 있는 경우 또한 다른 많은 것이 지금 바로 "
               "여기 있었다. "),
        "tr": ("ve pazar köyde bir soru vardı ama herkes için çok güzel "
               "değil mi bu enerji gibi daha sonra her şey onun kadar "
               "oldu ve kış bahçesinde olan hikaye bütün insanlar ile "
               "aynı yerde kaldı. "),
        "pl": ("i rynek był w wiosce że się nie jest to jak po wszystko "
               "dla ludzi ale czy za od o historii bardzo też przez zima "
               "w ogrodzie gdzie każdy miał już tylko jedno pytanie o "
               "energię dla nas. "),
        "id": ("yang pasar dan di desa ini adalah untuk semua orang "
               "dengan cerita itu juga akan tidak ada karena mereka bisa "
               "dalam musim dingin di kebun yang sama dengan pertanyaan "
               "tentang energi dari sejarah. "),
        "hi": ("के बाजार में सब लोग थे और यह कहानी बहुत अच्छी है तो भी "
               "नहीं वह इस एक साथ पर सर्दियों की ऊर्जा के लिए गया था जब "
               "सब लोग बाग में एक सवाल के साथ थे और इतिहास की बात करते "
               "थे. "),
        "vi": ("của và các có trong là cho không được người một những "
               "với khi này đã sẽ về như từ câu chuyện mùa đông trong "
               "khu vườn nơi mọi người đều có một câu hỏi về năng lượng "
               "của lịch sử. "),
    }
    for lg, lorem in LOREM.items():
        lpara = f"<p>{lorem}</p>"
        html_case(f"lang_{lg}_meta",
                  f"<html lang='{lg}'><head><title>T{lg}</title></head>"
                  "<body><div id='content' class='article-body'>"
                  + lpara * 3 + "</div></body></html>")
        html_case(f"lang_{lg}_vote",
                  "<html><head><title>V</title></head>"
                  "<body><div id='content' class='article-body'>"
                  + lpara * 3 + "</div></body></html>")
    html_case("torture_script_style_noise",
              "<html><head><title>Noise</title><style>p{color:red}</style>"
              "<script>var x = '<p>fake</p>';</script></head><body>"
              "<div id='content' class='article-body'>" + para
              + "<script>document.write('<div>junk</div>')</script>"
              + para + "</div></body></html>")
    return cases


def main() -> None:
    FIXDIR.mkdir(parents=True, exist_ok=True)
    n = 0
    for name, spans in handcrafted().items():
        _write(f"hc_{name}", spans)
        n += 1
    for doc in make_corpus(32, seed=42):
        _write(f"gen_{doc['doc_id']}", doc["spans"])
        n += 1
    print(f"wrote {n} fixture cases under {FIXDIR}")


def _write(case: str, spans: list[dict]) -> None:
    d = FIXDIR / case
    d.mkdir(parents=True, exist_ok=True)
    result = extract_document(case, spans)
    (d / "input.json").write_text(json.dumps(spans, indent=1))
    (d / "expected.json").write_text(json.dumps(
        {"spans": result["spans"], "lang": result["lang"],
         "n_spans": result["n_spans"], "title": result["title"],
         "outlinks": result["outlinks"]}, indent=1))


if __name__ == "__main__":
    main()
