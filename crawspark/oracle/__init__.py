"""Pure-Python deterministic extraction core (no Spark imports here).

The modules in this package implement SURVEY.md §2.3 as pure functions.
``extract.extract_document`` is the single entry point used both by the
fixture oracle (tests) and by the vectorized Arrow UDFs
(crawspark.operators.extract) — one implementation, two harnesses.
"""

from crawspark.oracle.extract import extract_document  # noqa: F401
