"""lasvdedup_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the *semantics* of Joon-Klaps/lasvdedup
(reference at /root/reference: pairwise-distance dedup of viral genome
sequences, single-linkage clustering, representative selection, 5-way
classification cascade), regrafted onto Common-Crawl-style web pages:

  pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

The reference's O(n^2) dense distance matrix
(/root/reference/lasvdedup/utils/distance_matrix.py:10-20) is replaced by
MinHash/LSH band-bucket joins; its in-memory single-linkage clustering
(/root/reference/lasvdedup/utils/sequence_grouping.py:89-118) by
large-star/small-star connected components on DataFrames; its global
multi-key rank (/root/reference/lasvdedup/utils/io_utils.py:48-55) by a
window function; its classification cascade
(/root/reference/lasvdedup/utils/sequence_grouping.py:185-353) by grouped
aggregates + CASE logic.

Design rules:
  * DataFrame/Catalyst first — hot paths are built-in SQL expressions
    (whole-stage codegen), never row-at-a-time Python.
  * Hashing is *portable*: md5-hex-prefix -> bigint, reproducible bit-for-bit
    in any ANSI SQL engine (used by the DuckDB correctness oracles). A faster
    xxhash64 family is available behind config for production.
  * Every stage checkpoints to a config-fingerprinted path so runs resume
    mid-pipeline (mirrors the reference's Snakemake incremental DAG,
    /root/reference/lasvdedup/pipeline.py:70-78).
"""

__version__ = "0.1.0"

from lasvdedup_spark.config import DedupConfig  # noqa: F401
