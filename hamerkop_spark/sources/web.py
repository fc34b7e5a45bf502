"""Web-page ingest (BASELINE.json input_hint): Iceberg/parquet table of
(url, warc_ts, html, text, lang) -> documents with extracted text.

The per-row invariant is *byte-identical extracted text per url*: one
pinned, deterministic extraction function, applied in mapInPandas with
Arrow batches. The synthetic corpus (synth.py) wraps text in the same
template, so extraction is byte-checkable end-to-end
(tests/test_web.py).
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The pinned extraction contract: page body lives in <article>...</article>,
# HTML-escaped. Deterministic by construction; versioned so a changed
# extractor can never silently mix with old checkpoints.
EXTRACTOR_VERSION = 1
_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def wrap_text_as_html(text: str, url: str) -> bytes:
    """The inverse used by the corpus generator: embed text in the page
    template (escaped), so extract_text(wrap(text)) == text, bytewise."""
    body = _html.escape(text, quote=False)
    page = (
        f"<html><head><title>{_html.escape(url, quote=False)}</title></head>"
        f"<body><nav>boilerplate nav</nav><article>{body}</article>"
        f"<footer>boilerplate footer</footer></body></html>"
    )
    return page.encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Pinned extraction: article body, tags stripped, entities unescaped.
    Falls back to whole-body tag-strip when no <article> is present."""
    if html_bytes is None:
        return ""
    m = _ARTICLE_RE.search(html_bytes)
    raw = m.group(1) if m else html_bytes
    s = raw.decode("utf-8", errors="replace")
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)


def ingest_pages(pages: DataFrame) -> DataFrame:
    """pages -> documents: extract text from html via Arrow-batched
    mapInPandas (no shuffle, partitioning preserved); attach doc_id (=url,
    per input_hint) and extracted_text. Downstream stages verify
    extracted_text == text per url (the invariant) before trusting either.
    """
    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("extracted_text", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "text": pdf["text"],
                    "extracted_text": pdf["html"].map(extract_text),
                }
            )

    return pages.mapInPandas(run, schema=out_schema)


def check_extraction_invariant(documents: DataFrame) -> int:
    """Count of urls violating byte-identity (must be 0)."""
    return documents.where(
        F.col("extracted_text") != F.col("text")
    ).count()
