"""Bloom-filter equality file skipping (lakehouse/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from de_gcp_lakehouse_iceberg_spark.lakehouse import LakeTable
from de_gcp_lakehouse_iceberg_spark.lakehouse.bloom import (
    _h_str_py,
    _positions_py,
    add_bloom_filters,
    positions_col,
)


def _interleaved_table(spark, tmp_path, n_files=8, rows_per_file=200):
    """High-cardinality ids striped across files: every file's
    [min, max] spans nearly the full range, so stats NEVER prune an
    equality probe — the bloom's exact target shape."""
    t = LakeTable.create(spark, str(tmp_path / "t"))
    n = n_files * rows_per_file
    for i in range(n_files):
        df = spark.range(0, n).filter(F.col("id") % n_files == i).select(
            F.col("id").alias("uid"),
            F.concat(F.lit("user_"), F.col("id")).alias("name"),
        )
        t.append(df.coalesce(1))
    return t, n


def test_bloom_prunes_interleaved_equality(spark, tmp_path):
    t, n = _interleaved_table(spark, tmp_path)
    probe = 1237                       # lives in exactly one file

    # without blooms: stats keep every file
    _s, before = t.plan_files(where=[("uid", "=", probe)])
    assert len(before) == 8

    add_bloom_filters(t, ["uid", "name"])
    _s, after = t.plan_files(where=[("uid", "=", probe)])
    assert 1 <= len(after) < 8         # most files provably lack the id
    assert t.scan(where=[("uid", "=", probe)]).count() == 1

    # string-column probe prunes too
    _s, after_s = t.plan_files(where=[("name", "=", f"user_{probe}")])
    assert 1 <= len(after_s) < 8
    assert (
        t.scan(where=[("name", "=", f"user_{probe}")]).count() == 1
    )

    # no false negatives anywhere: every present id's file is kept
    for uid in (0, 7, n - 1):
        _s, kept = t.plan_files(where=[("uid", "=", uid)])
        assert t.scan(where=[("uid", "=", uid)]).count() == 1, uid
        assert kept


def test_bloom_absent_value_can_prune_everything(spark, tmp_path):
    t, n = _interleaved_table(spark, tmp_path, n_files=4, rows_per_file=100)
    add_bloom_filters(t, ["uid"])
    _s, kept = t.plan_files(where=[("uid", "=", n + 999_983)])
    # absent value: usually 0 files survive (bloom FPR may keep a few)
    assert len(kept) <= 1
    assert t.scan(where=[("uid", "=", n + 999_983)]).count() == 0


def test_bloom_hash_parity_python_vs_spark(spark):
    df = spark.createDataFrame(
        [(7,), (123456789,), (0,)], "v long"
    ).select(positions_col(F.col("v"), False, 4096, 5).alias("p"), "v")
    for r in df.collect():
        assert list(r.p) == _positions_py(r.v, 4096, 5)

    sdf = spark.createDataFrame(
        [("user_1237",), ("",), ("héllo wörld",)], "s string"
    ).select(positions_col(F.col("s"), True, 4096, 5).alias("p"), "s")
    for r in sdf.collect():
        assert list(r.p) == _positions_py(r.s, 4096, 5), r.s


def test_bloom_survives_append_and_other_predicates(spark, tmp_path):
    t, n = _interleaved_table(spark, tmp_path, n_files=4, rows_per_file=100)
    add_bloom_filters(t, ["uid"])
    # a later append's files simply have no bloom → never pruned by it
    t.append(
        spark.range(n, n + 50)
        .select(F.col("id").alias("uid"),
                F.concat(F.lit("user_"), F.col("id")).alias("name"))
        .coalesce(1)
    )
    probe = n + 25
    _s, kept = t.plan_files(where=[("uid", "=", probe)])
    assert t.scan(where=[("uid", "=", probe)]).count() == 1
    # range predicates ignore blooms entirely
    assert (
        t.scan(where=[("uid", ">=", n)]).count() == 50
    )


def test_bloom_rejects_unsupported_column_type(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"))
    t.append(spark.range(3).select(F.col("id").cast("double").alias("x")))
    with pytest.raises(ValueError, match="only integer/string"):
        add_bloom_filters(t, ["x"])
    with pytest.raises(ValueError, match="no column"):
        add_bloom_filters(t, ["nope"])


def test_str_hash_handles_unicode(spark):
    # non-ASCII codepoints fold identically on both sides
    a = _h_str_py("héllo")
    b = _h_str_py("hello")
    assert a != b


def test_bloom_no_false_negatives_property(spark, tmp_path):
    """Hypothesis: for ANY id set and probe drawn from it, the bloom
    never prunes the file holding the probe (false positives allowed,
    false negatives never)."""
    from hypothesis import given, settings, strategies as st

    from de_gcp_lakehouse_iceberg_spark.lakehouse.bloom import (
        _bitset_to_b64,
        _b64_has,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        ids=st.lists(
            st.integers(min_value=0, max_value=2**62),
            min_size=1,
            max_size=50,
            unique=True,
        ),
        data=st.data(),
    )
    def check(ids, data):
        bits, k = 512, 4
        probe = data.draw(st.sampled_from(ids))
        all_pos = sorted(
            {p for v in ids for p in _positions_py(v, bits, k)}
        )
        b64 = _bitset_to_b64(all_pos, bits)
        assert all(
            _b64_has(b64, p) for p in _positions_py(probe, bits, k)
        )

    check()


def test_bloom_conservative_after_compaction(spark, tmp_path):
    """Compaction rewrites files WITHOUT blooms — the new files simply
    have none and are never pruned by a probe (conservative, correct);
    re-running add_bloom_filters restores the pruning."""
    from de_gcp_lakehouse_iceberg_spark.lakehouse.bloom import (
        add_bloom_filters,
    )
    from de_gcp_lakehouse_iceberg_spark.lakehouse.maintenance import (
        compact,
    )

    t, n = _interleaved_table(spark, tmp_path, n_files=4, rows_per_file=100)
    add_bloom_filters(t, ["uid"])
    probe = 137
    _s, before = t.plan_files(where=[("uid", "=", probe)])
    assert len(before) < 4

    compact(t, target_file_size=1 << 30)      # everything into one file
    assert t.scan().count() == n              # rows intact
    assert t.scan(where=[("uid", "=", probe)]).count() == 1
    # rebuilt blooms prune again on the compacted layout
    add_bloom_filters(t, ["uid"])
    _s, after = t.plan_files(where=[("uid", "=", probe)])
    assert t.scan(where=[("uid", "=", probe)]).count() == 1
    assert len(after) >= 1


def test_bloom_negative_int_keys_no_false_negative(spark, tmp_path):
    """SQL % follows the dividend's sign; the build must use pmod so a
    negative key hashes identically to the Python plan-time probe —
    the r4 bug was a bloom FALSE NEGATIVE (file with the value pruned)."""
    t = LakeTable.create(spark, str(tmp_path / "neg"))
    t.append(
        spark.createDataFrame([(-5,), (3,), (-1000000007,)], "id long")
        .coalesce(1)
    )
    t.append(
        spark.createDataFrame([(8,), (-42,)], "id long").coalesce(1)
    )
    add_bloom_filters(t, ["id"])
    for probe in (-5, 3, -1000000007, 8, -42):
        _s, kept = t.plan_files(where=[("id", "=", probe)])
        assert kept, f"bloom false negative for {probe}"
        assert t.scan(where=[("id", "=", probe)]).count() == 1, probe


def test_bloom_hash_parity_negative_ints(spark):
    df = spark.createDataFrame(
        [(-1,), (-5,), (-2147483648,), (-9223372036854775808,)], "v long"
    ).select(positions_col(F.col("v"), False, 4096, 5).alias("p"), "v")
    for r in df.collect():
        assert list(r.p) == _positions_py(r.v, 4096, 5), r.v
        assert all(0 <= p < 4096 for p in r.p), r.v


def test_bitset_word_assembly_byte_identical():
    """The distributed build aggregates int64 words; its b64 must be
    byte-identical to the per-position assembly for the same set."""
    import random

    from de_gcp_lakehouse_iceberg_spark.lakehouse.bloom import (
        _bitset_to_b64,
        _words_to_b64,
    )

    rng = random.Random(7)
    for bits in (64, 512, 4096):
        positions = sorted({rng.randrange(bits) for _ in range(bits // 3)})
        words: dict[int, int] = {}
        for p in positions:
            w = p // 64
            words[w] = words.get(w, 0) | (1 << (p % 64))
        # sign-extend like a Spark long would arrive
        signed = [
            (w, v - (1 << 64) if v >= (1 << 63) else v)
            for w, v in words.items()
        ]
        assert _words_to_b64(signed, bits) == _bitset_to_b64(positions, bits)


def test_bitset_raises_on_out_of_range():
    from de_gcp_lakehouse_iceberg_spark.lakehouse.bloom import (
        _bitset_to_b64,
        _words_to_b64,
    )

    with pytest.raises(ValueError):
        _bitset_to_b64([-1], 4096)
    with pytest.raises(ValueError):
        _bitset_to_b64([4096], 4096)
    with pytest.raises(ValueError):
        _words_to_b64([(64, 1)], 4096)
