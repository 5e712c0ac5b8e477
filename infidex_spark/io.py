"""Input-table access: Iceberg-first, parquet fallback.

The production input is an Iceberg table of Common-Crawl-style web pages
(url, warc_ts, html, text, lang). This sandbox ships no Iceberg runtime
jar, so the Iceberg path is exercised structurally (spark.table / SQL
identifier) and falls back to parquet directories, which carry the same
logical schema. On a real cluster, pass
  --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>
  --conf spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog
and give `iceberg:<cat>.<db>.<table>` refs to these helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_webtext(spark: SparkSession, ref: str) -> DataFrame:
    """ref forms:
    - 'iceberg:<catalog.db.table>'  -> spark.table (snapshot read; time
      travel via '@snapshot_id' suffix, VERSION AS OF)
    - 'table:<name>'                -> spark.table
    - anything else                 -> parquet path
    """
    if ref.startswith("iceberg:") or ref.startswith("table:"):
        ident = ref.split(":", 1)[1]
        if "@" in ident:
            ident, snap = ident.rsplit("@", 1)
            return spark.read.option("snapshot-id", snap).table(ident)
        return spark.table(ident)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """Symmetric writer: Iceberg table identifier or parquet path."""
    if ref.startswith("iceberg:") or ref.startswith("table:"):
        ident = ref.split(":", 1)[1]
        df.writeTo(ident).createOrReplace() if mode == "overwrite" else df.writeTo(
            ident
        ).append()
    else:
        df.write.mode(mode).parquet(ref)
