"""Dialect-aware name normalization (stages/naming.py) —
destination_name_transformer.py / table_name_registry.py parity."""
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from airbyte_ray.stages.naming import DIALECT_LIMITS, NameNormalizer, normalize_dataset


def test_basic_sanitization():
    n = NameNormalizer("postgres")
    assert n.normalize("  Hello World!  ") == "hello_world"
    assert n.normalize("99 problems") == "_99_problems"
    assert n.normalize("a--b++c") == "a_b_c"
    assert n.normalize("") == "field"
    assert n.normalize("Crème Brûlée") == "creme_brulee"  # NFKD ascii fold


def test_reserved_words_suffixed_per_dialect():
    pg = NameNormalizer("postgres")
    assert pg.normalize("select") == "select_"
    assert pg.normalize("returning") == "returning_"  # postgres-specific
    bq = NameNormalizer("bigquery")
    assert bq.normalize("partition") == "partition_"
    assert bq.normalize("returning") == "returning"  # not reserved there


def test_case_convention_per_dialect():
    assert NameNormalizer("snowflake").normalize("MyCol") == "MYCOL"
    assert NameNormalizer("oracle").normalize("MyCol") == "MYCOL"
    assert NameNormalizer("redshift").normalize("MyCol") == "mycol"


def test_middle_truncation_keeps_prefix_and_suffix():
    n = NameNormalizer("postgres")  # effective limit 55
    long = "prefix_" + "x" * 100 + "_suffix"
    out = n.normalize(long)
    assert len(out) <= n.limit
    assert "__" in out
    assert out.startswith("prefix_")
    assert out.endswith("_suffix")


def test_collision_suffixing_deterministic():
    n = NameNormalizer("duckdb")
    m = n.unique(["User Id", "user_id", "USER-ID", "other"])
    assert m["User Id"] == "user_id"
    assert m["user_id"] == "user_id_1"
    assert m["USER-ID"] == "user_id_2"
    assert m["other"] == "other"
    assert len(set(v.lower() for v in m.values())) == 4


def test_collision_with_explicit_suffix_present():
    n = NameNormalizer("duckdb")
    m = n.unique(["a", "a_1", "A"])  # 'A' would collide with both
    assert len(set(m.values())) == 3


def test_normalize_schema_and_table():
    n = NameNormalizer("postgres")
    t = pa.table({"Sel ect": [1], "select": [2]})
    out = n.rename_table(t)
    assert out.column_names == ["sel_ect", "select_"]
    sch = n.normalize_schema(t.schema)
    assert sch.names == ["sel_ect", "select_"]
    assert sch.types == t.schema.types


def test_unknown_dialect_rejected():
    with pytest.raises(ValueError, match="unknown dialect"):
        NameNormalizer("sqlite3000")


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_normalize_always_valid_identifier(s):
    for d in DIALECT_LIMITS:
        out = NameNormalizer(d).normalize(s)
        assert out
        assert len(out) <= DIALECT_LIMITS[d]
        assert not out[0].isdigit()
        import re

        assert re.fullmatch(r"[A-Za-z0-9_]+", out)


@given(st.lists(st.text(min_size=0, max_size=30), max_size=20))
@settings(max_examples=100, deadline=None)
def test_unique_is_injective(names):
    m = NameNormalizer("duckdb").unique(names)
    vals = list(m.values())
    assert len(set(v.lower() for v in vals)) == len(vals)


def test_normalize_dataset_metadata_only(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"User Id": [1, 2], "select": [3, 4]}))
    out = normalize_dataset(ds, "duckdb")
    assert out.schema().names == ["user_id", "select_"]
    assert sorted(out.to_pandas()["user_id"]) == [1, 2]
