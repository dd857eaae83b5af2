"""glaredb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GlareDB (reference: /root/reference,
v25.6.3), re-expressed Spark-first.

The engine is a library over SparkSession (SURVEY.md §7): a session facade
with GlareDB-equivalent defaults, a function registry covering the
reference's scalar/aggregate surface (reference registries:
crates/glaredb_core/src/functions/scalar/builtin/mod.rs:130-160 and
functions/aggregate/builtin/mod.rs:48-74), scan/sink helpers, and
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal) that go beyond the reference surface.

Usage::

    import glaredb_spark as gdb
    sess = gdb.connect()
    sess.register_tables("/root/testdata/sf0.01")
    sess.sql("SELECT count(*) FROM lineitem").show()
"""

from glaredb_spark.session import GlareSession, connect, get_spark

__version__ = "0.1.0"

__all__ = ["GlareSession", "connect", "get_spark", "__version__"]
