"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, language-ID, document fingerprinting. All JVM-side
built-ins (regexp/md5/length) — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawspark.registry import register
from crawspark.sources import read_testdata

# BPE-ish token pattern: word pieces, numbers, or single punctuation.
_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

_EN_PROBE = r"\b(the|and|of|to|in|is|that|for|it|with)\b"
_FR_PROBE = r"\b(le|la|les|de|des|et|en|un|une|que)\b"
_ES_PROBE = r"\b(el|los|las|de|y|en|un|una|que|por)\b"


@register("text_token_count", sql=f"""
    SELECT lang,
           CAST(sum(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT)
             AS total_tokens,
           count(*) AS n_docs
    FROM documents GROUP BY lang
""")
def text_token_count(spark, sf_dir):
    return (read_testdata(spark, sf_dir, "documents")
            .withColumn("n_tokens",
                        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)))
            .groupBy("lang")
            .agg(F.sum("n_tokens").cast("long").alias("total_tokens"),
                 F.count("*").alias("n_docs")))


@register("text_quality_score", sql="""
    SELECT doc_id,
           CAST(round(CAST(length(text) - length(replace(text, ' ', ''))
                      AS DOUBLE) / greatest(length(text), 1), 4) AS DOUBLE)
             AS space_ratio,
           CAST(round(CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE)
                      / greatest(length(text), 1), 4) AS DOUBLE)
             AS punct_ratio,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
""")
def text_quality_score(spark, sf_dir):
    t = F.col("text")
    tl = F.greatest(F.length(t), F.lit(1))
    return (read_testdata(spark, sf_dir, "documents")
            .select(
                "doc_id",
                F.round((F.length(t) - F.length(F.replace(t, F.lit(" "),
                                                          F.lit(""))))
                        .cast("double") / tl, 4).alias("space_ratio"),
                F.round(F.size(F.regexp_extract_all(t, F.lit(r"[.!?,;:]"), 0))
                        .cast("double") / tl, 4).alias("punct_ratio"),
                F.length(t).cast("long").alias("text_len")))


@register("lang_id_stopwords", sql=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN len(regexp_extract_all(lower(text), '{_FR_PROBE}')) >
                  len(regexp_extract_all(lower(text), '{_EN_PROBE}'))
              AND len(regexp_extract_all(lower(text), '{_FR_PROBE}')) >=
                  len(regexp_extract_all(lower(text), '{_ES_PROBE}'))
               THEN 'fr'
             WHEN len(regexp_extract_all(lower(text), '{_ES_PROBE}')) >
                  len(regexp_extract_all(lower(text), '{_EN_PROBE}'))
               THEN 'es'
             ELSE 'en'
           END AS predicted_lang
    FROM documents
""")
def lang_id_stopwords(spark, sf_dir):
    # n-gram/stopword-probe language ID, fully JVM-side.
    low = F.lower(F.col("text"))
    en = F.size(F.regexp_extract_all(low, F.lit(_EN_PROBE)))
    fr = F.size(F.regexp_extract_all(low, F.lit(_FR_PROBE)))
    es = F.size(F.regexp_extract_all(low, F.lit(_ES_PROBE)))
    pred = (F.when((fr > en) & (fr >= es), "fr")
            .when(es > en, "es")
            .otherwise("en"))
    return (read_testdata(spark, sf_dir, "documents")
            .select("doc_id", F.col("lang").alias("labeled_lang"),
                    pred.alias("predicted_lang")))


@register("text_fingerprint", sql=r"""
    SELECT doc_id,
           substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 16)
             AS fingerprint
    FROM documents
""")
def text_fingerprint(spark, sf_dir):
    # Normalized-text fingerprint (whitespace-collapse + lowercase + md5/64).
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return (read_testdata(spark, sf_dir, "documents")
            .select("doc_id",
                    F.substring(F.md5(norm), 1, 16).alias("fingerprint")))
