"""Run one or more reference .slt files and print failures (triage tool)."""

import sys

from pyspark.sql import SparkSession

from glaredb_spark import GlareSession
from glaredb_spark.functions.register import register_all
from glaredb_spark.slt import run_slt_file

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
register_all(spark)
sess = GlareSession(spark)
for path in sys.argv[1:]:
    res = run_slt_file(sess, path)
    print(f"== {path}: ok={res.ok} lenient={res.lenient} skipped={res.skipped} failures={len(res.failures)}")
    for f in res.failures[:12]:
        print("   ", f)
