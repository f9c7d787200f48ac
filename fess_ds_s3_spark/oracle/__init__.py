"""Single-threaded pure-Python oracle of the reference crawl semantics."""

from fess_ds_s3_spark.oracle.crawler import OracleCrawler, OracleResult

__all__ = ["OracleCrawler", "OracleResult"]
