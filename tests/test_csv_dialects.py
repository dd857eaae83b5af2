"""CSV dialect/schema-inference conformance (reference: glaredb_ext_csv
schema.rs + dialect.rs auto-detection; FIXTURES.md §5 categories:
delimiter variants, headers, quoted fields, NULL encodings, glob)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv_fixtures")
    (d / "comma.csv").write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    (d / "semicolon.csv").write_text("id;name;score\n1;alpha;1.5\n2;beta;2.5\n")
    (d / "tab.tsv").write_text("id\tname\tscore\n1\talpha\t1.5\n2\tbeta\t2.5\n")
    (d / "quoted.csv").write_text(
        'id,text\n1,"hello, world"\n2,"line with ""quotes"""\n'
    )
    (d / "nulls.csv").write_text("id,val\n1,\n2,NULL\n3,7\n")
    (d / "noheader.csv").write_text("1,alpha\n2,beta\n")
    (d / "part1.csv").write_text("id,v\n1,a\n")
    (d / "part2.csv").write_text("id,v\n2,b\n")
    return str(d)


def test_comma_inference(spark, data_dir):
    from glaredb_spark.sources.files import read_csv

    df = read_csv(spark, os.path.join(data_dir, "comma.csv"))
    assert df.columns == ["id", "name", "score"]
    # integer csv columns widen to bigint for reference parity (schema.rs)
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "score": "double"}
    assert df.count() == 2


def test_semicolon_and_tab(spark, data_dir):
    from glaredb_spark.sources.files import read_csv

    df = read_csv(spark, os.path.join(data_dir, "semicolon.csv"), sep=";")
    assert df.columns == ["id", "name", "score"]
    tsv = read_csv(spark, os.path.join(data_dir, "tab.tsv"), sep="\t")
    assert tsv.columns == ["id", "name", "score"]
    assert tsv.agg(F.sum("score")).collect()[0][0] == 4.0


def test_quoted_fields(spark, data_dir):
    from glaredb_spark.sources.files import read_csv

    df = read_csv(spark, os.path.join(data_dir, "quoted.csv"))
    rows = {r.id: r.text for r in df.collect()}
    assert rows[1] == "hello, world"
    assert rows[2] == 'line with "quotes"'


def test_null_encodings(spark, data_dir):
    from glaredb_spark.sources.files import read_csv

    df = read_csv(
        spark, os.path.join(data_dir, "nulls.csv"), nullValue="NULL"
    )
    vals = [r.val for r in df.orderBy("id").collect()]
    assert vals[0] is None and vals[1] is None and vals[2] == 7


def test_headerless(spark, data_dir):
    from glaredb_spark.sources.files import read_csv

    df = read_csv(spark, os.path.join(data_dir, "noheader.csv"), header=False)
    assert df.count() == 2
    assert len(df.columns) == 2


def test_multi_file_glob(spark, data_dir):
    from glaredb_spark.sources.files import read_csv

    df = read_csv(spark, os.path.join(data_dir, "part*.csv"))
    assert df.count() == 2
    assert sorted(r.v for r in df.collect()) == ["a", "b"]
