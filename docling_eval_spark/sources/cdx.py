"""CDXJ crawl-index source — locate WARC records without scanning archives.

Common Crawl (and every wayback-style archive) publishes its index as
CDXJ text: one line per capture,

    org,example)/path 20240101000000 {"url": "...", "mime": "text/html",
        "status": "200", "digest": "sha1:...", "length": "1234",
        "offset": "5678", "filename": "crawl-data/.../x.warc.gz"}

i.e. a SURT-sorted key, a 14-digit timestamp, and a JSON block with the
byte range of the record inside its WARC file (public format:
https://github.com/webrecorder/cdxj-indexer / the ISO 28500 ecosystem).
Reference analog: none — the reference ingests prepared datasets; this
is the index-first ingestion edge that makes 100 TB crawls tractable:
instead of scanning every archive (`sources/warc.py` fans archives out
at input-split parallelism), the pipeline filters the INDEX (a ~0.1%
sized text table) and fetches only the selected byte ranges.

Spark shape: the whole parse is native expressions — two
`substring_index` splits for the three fields plus one `from_json` for
the block — so index selection (status, mime, URL predicates, digest
dedup, latest-capture collapse) runs at scan speed with predicate
pushdown on anything derived; the output manifest is repartitioned by
archive file and sorted by offset inside each partition so a fetcher
reads each WARC sequentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the JSON block's published fields (all strings in CDXJ)
_BLOCK_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
])

CDX_COLUMNS = ("surt_key", "capture_ts", "url", "mime", "status",
               "digest", "warc_filename", "offset", "length")


def parse_cdxj(df: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ text lines -> typed capture rows, native expressions only.

    Lines that do not carry a parsable JSON block yield null fields
    (from_json's failure posture) rather than dropped rows, so torn
    index shards stay accountable — filter on `offset IS NOT NULL` to
    keep fetchable captures."""
    line = F.col(line_col)
    surt = F.substring_index(line, " ", 1)
    ts = F.substring_index(F.substring_index(line, " ", 2), " ", -1)
    # everything after the second space is the JSON block (the block
    # itself contains spaces, so expr-split on the first two only)
    block = F.expr(
        f"substring({line_col}, length(substring_index({line_col}, ' ', 2)) + 2)")
    j = F.from_json(block, _BLOCK_SCHEMA)
    return df.select(
        surt.alias("surt_key"),
        # try_: torn lines must yield null, not an ANSI raise
        F.try_to_timestamp(ts, F.lit("yyyyMMddHHmmss")).alias("capture_ts"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].cast("int").alias("status"),
        j["digest"].alias("digest"),
        j["filename"].alias("warc_filename"),
        j["offset"].cast("long").alias("offset"),
        j["length"].cast("long").alias("length"),
    )


def surt_host(surt_key_col) -> "F.Column":
    """SURT key -> forward hostname: 'org,example)/path' ->
    'example.org' (reverse the comma-joined labels before the ')')."""
    rev = F.split(F.substring_index(surt_key_col, ")", 1), ",")
    return F.array_join(F.reverse(rev), ".")


def cdx_fetch_manifest(captures: DataFrame,
                       statuses: tuple = (200,),
                       mimes: tuple = ("text/html",),
                       latest_only: bool = True,
                       dedup_digest: bool = True) -> DataFrame:
    """Selected captures -> a fetch manifest (warc_filename, offset,
    length, url, capture_ts, digest).

    Selection order is the cheap-first curation shape: status/mime
    predicates at the scan, then latest-capture-per-url collapse
    (max_by — partial-aggregable, no window), then content dedup on the
    index's own payload digest (min_by keeps the earliest capture of
    each payload — RefinedWeb-style URL/content dedup BEFORE any byte
    is fetched). The result repartitions by archive file and sorts by
    offset within partitions so a fetcher streams each WARC forward."""
    sel = captures.where(F.col("offset").isNotNull())
    if statuses:
        sel = sel.where(F.col("status").isin(*[int(s) for s in statuses]))
    if mimes:
        sel = sel.where(F.col("mime").isin(*list(mimes)))
    cols = ("url", "capture_ts", "digest", "warc_filename", "offset",
            "length")
    if latest_only:
        row = F.struct(*[F.col(c) for c in cols[1:]])
        sel = (sel.groupBy("url")
               .agg(F.max_by(row, "capture_ts").alias("_r"))
               .select("url", *[F.col(f"_r.{c}") for c in cols[1:]]))
    if dedup_digest:
        row = F.struct(*[F.col(c) for c in cols if c != "digest"])
        sel = (sel.groupBy("digest")
               .agg(F.min_by(row, F.struct("capture_ts", "url"))
                    .alias("_r"))
               .select(*[F.col(f"_r.{c}") for c in cols if c != "digest"],
                       "digest"))
    return (sel.select(*cols)
            .repartition(F.col("warc_filename"))
            .sortWithinPartitions("warc_filename", "offset"))
