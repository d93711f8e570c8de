"""Text functions: tokenization, shingling, HTML text extraction.

The per-row invariant vs the reference (BASELINE.json input_hint) is
*byte-identical extracted text per url*. Extraction exists in two forms:

  * ``extract_text_udf`` — vectorized Arrow pandas UDF (the production path:
    real-world HTML needs a Python parser; per-row Python is forbidden, so a
    batch regex over a pandas Series).
  * ``extract_text_sql`` — pure-SQL regexp form for the deterministic
    synthetic template; used by oracle-checked queries and to *prove* the
    UDF byte-identical (tests assert udf == sql == original text).

Tokenization is whitespace-split over lowercased text — the analog of the
reference's name normalization (spaces -> underscores,
/root/reference/lasvdedup/utils/distance_matrix.py:16): a single canonical
form computed once, used everywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# The deterministic HTML template used by the synthetic pages table.
# Keep in sync between synth.py (builder) and the extractors below.
HTML_PREFIX = "<html><head><title>d</title></head><body><p>"
HTML_SUFFIX = "</p></body></html>"
_EXTRACT_RE = r"<body><p>(.*)</p></body>"


def wrap_html_expr(text_col: str, title_col: str) -> Column:
    """Build the synthetic html binary column from text (deterministic)."""
    return F.encode(
        F.concat(
            F.lit("<html><head><title>"),
            F.col(title_col),
            F.lit("</title></head><body><p>"),
            F.col(text_col),
            F.lit(HTML_SUFFIX),
        ),
        "UTF-8",
    )


def extract_text_udf():
    """Arrow-vectorized HTML -> text extraction (batch regex, no per-row
    Python loop in user code; pandas .str ops are the vector kernel).

    Two-phase, both deterministic (pure functions of the html bytes, so the
    per-url byte-identical invariant holds):

      1. the synthetic-template fast path (one vectorized regex — and the
         form the SQL twin can replicate byte-for-byte);
      2. a general fallback for rows the template misses — real
         Common-Crawl-style HTML with nested tags, entities, comments,
         broken markup: strip <script>/<style>/comments, strip all tags,
         decode entities, collapse whitespace. The reference analog is the
         FASTA parse every run starts from
         (/root/reference/lasvdedup/utils/determine_duplicates.py:145) —
         input normalization before any distance math.

    The fallback is pandas .str regex ops except entity decoding
    (html.unescape has no vectorized form; it runs only on the
    fallback-and-contains-'&' subset, still inside the Arrow batch).
    Entity decoding can RESURFACE markup ('&lt;script&gt;...' becomes
    literal '<script>...'), so the tag-strip passes re-run on the decoded
    subset — escaped markup in the source must strip like real markup.

    Factory (not module-level decoration): pandas_udf resolves its return
    type against the active SparkSession, which need not exist at import.
    """
    import html as _htmllib

    def _strip_markup(s: pd.Series) -> pd.Series:
        s = s.str.replace(
            r"(?is)<(script|style)[^>]*>.*?</\1\s*>", " ", regex=True
        )
        s = s.str.replace(r"(?s)<!--.*?-->", " ", regex=True)
        return s.str.replace(r"(?s)<[^>]*>", " ", regex=True)

    @pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        # vectorized decode (C loop in pandas), not a per-row Python lambda
        s = html.str.decode("utf-8", errors="replace")
        out = s.str.extract(_EXTRACT_RE, expand=False)
        miss = out.isna()
        if miss.any():
            fb = _strip_markup(s[miss])
            has_ent = fb.str.contains("&", regex=False)
            if has_ent.any():
                fb.loc[has_ent] = _strip_markup(
                    fb[has_ent].map(_htmllib.unescape)
                )
            fb = fb.str.replace(r"\s+", " ", regex=True).str.strip()
            out = out.where(~miss, fb)
        return out.fillna("")

    return _extract


def extract_text_sql(html_col: str = "html") -> Column:
    """Pure-SQL twin of extract_text_udf for the synthetic template."""
    return F.regexp_extract(F.decode(F.col(html_col), "UTF-8"), _EXTRACT_RE, 1)


def tokens_expr(text_col: str = "text") -> Column:
    """Canonical tokenization: lowercase, trim, split on whitespace runs."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles_expr(k: int, tokens_col: str = "tokens") -> Column:
    """Distinct word k-shingles as array<string>.

    Docs shorter than k tokens produce their single full-text "shingle"
    (sequence(0, size-k) with size<k yields an empty range; we guard with
    greatest() so every doc has >= 1 shingle — a doc with no shingles could
    never match anything, including an exact copy of itself).
    """
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(0, greatest(size({tokens_col}) - {k}, 0)), "
        f"  i -> concat_ws(' ', slice({tokens_col}, i + 1, {k}))))"
    )


def lgrams_expr(length: int, tokens_col: str = "tokens") -> Column:
    """Contiguous L-token grams (NOT distinct-deduped shingle set) — the
    long-shared-span tier: two docs share an L-token contiguous span iff
    they share at least one L-gram. Exact, no suffix array needed for the
    membership question; the suffix-array applyInPandas op reports actual
    span lengths for candidates (operators/substring.py)."""
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(0, greatest(size({tokens_col}) - {length}, 0)), "
        f"  i -> concat_ws(' ', slice({tokens_col}, i + 1, {length}))))"
    )
