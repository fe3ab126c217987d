"""Connected components vs a union-find oracle on random graphs (T2 style)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simhash_spark.operators.connected_components import connected_components


def _uf_components(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


def _check(spark, n: int, edges: list[tuple[int, int]]):
    ids = [f"n{i:05d}" for i in range(n)]
    pdf = pd.DataFrame({"a": [ids[a] for a, _ in edges], "b": [ids[b] for _, b in edges]})
    df = spark.createDataFrame(pdf, schema="a string, b string")
    want = _uf_components(n, edges)
    touched = {i for e in edges for i in e}
    # BOTH paths must produce the identical min-id labels: the driver
    # union-find shortcut (default) and the distributed star loop (forced
    # via small_graph_limit=0)
    for limit in (200_000, 0):
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(df, small_graph_limit=limit).collect()
        }
        for i in touched:
            assert got[ids[i]] == ids[want[i]], (limit, i, got[ids[i]], ids[want[i]])
        assert set(got) == {ids[i] for i in touched}


def test_cc_random_graphs(spark):
    rng = np.random.default_rng(3)
    for trial, (n, m) in enumerate([(30, 20), (200, 150), (500, 700)]):
        edges = [tuple(sorted(map(int, rng.integers(0, n, 2)))) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, n, edges)


def test_cc_shapes(spark):
    # chain (worst case for naive propagation), star, two components, self-contained
    chain = [(i, i + 1) for i in range(40)]
    _check(spark, 41, chain)
    star = [(0, i) for i in range(1, 30)]
    _check(spark, 30, star)
    two = [(0, 1), (1, 2), (10, 11), (11, 12)]
    _check(spark, 13, two)


def test_cc_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [], "b": []}), schema="a string, b string")
    assert connected_components(df).count() == 0


def test_cc_restores_constraint_conf(spark):
    """The save/set/restore defense must leave the caller's session conf
    exactly as it found it (whatever it was)."""
    key = "spark.sql.constraintPropagation.enabled"
    old = spark.conf.get(key, "true")
    try:
        for val in ("true", "false"):
            spark.conf.set(key, val)
            df = spark.createDataFrame(
                pd.DataFrame({"a": ["x"], "b": ["y"]}), schema="a string, b string"
            )
            connected_components(df).collect()
            assert spark.conf.get(key) == val
    finally:
        spark.conf.set(key, old)


def test_cc_reliable_checkpoint_and_resume(spark, tmp_path):
    """Fault-tolerance path: with a catalog + ckpt_every, rounds land as
    cc_round_* stages (parquet + manifest) and a rerun resumes from the
    latest complete round instead of round 0 (VERDICT r1 item 6)."""
    from simhash_spark.sources.catalog import CheckpointCatalog

    n = 120
    rng = np.random.default_rng(11)
    edges = [tuple(sorted(map(int, rng.integers(0, n, 2)))) for _ in range(160)]
    edges = [(a, b) for a, b in edges if a != b]
    ids = [f"n{i:05d}" for i in range(n)]
    pdf = pd.DataFrame({"a": [ids[a] for a, _ in edges], "b": [ids[b] for _, b in edges]})
    df = spark.createDataFrame(pdf, schema="a string, b string")

    cat = CheckpointCatalog(spark, tmp_path / "cc_ckpt")
    got1 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            df, catalog=cat, ckpt_every=1, input_fingerprint="g1"
        ).collect()
    }
    want = _uf_components(n, edges)
    touched = {i for e in edges for i in e}
    assert got1 == {ids[i]: ids[want[i]] for i in touched}

    rounds = sorted(p.name for p in (tmp_path / "cc_ckpt").glob("cc_round_*"))
    assert rounds, "no reliable checkpoints written"
    for r in rounds:
        m = cat.manifest(r)
        assert m and m["complete"] and m["input_fingerprint"] == "g1"

    # resume: drop the LAST round's manifest (simulated crash mid-round);
    # the rerun must restart from the remaining latest round, not round 0,
    # and converge to the same labels
    last = rounds[-1]
    ((tmp_path / "cc_ckpt") / last / "_manifest.json").unlink()
    got2 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            df, catalog=cat, ckpt_every=1, input_fingerprint="g1"
        ).collect()
    }
    assert got2 == got1

    # a different input fingerprint must NOT resume from these checkpoints
    got3 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            df, catalog=cat, ckpt_every=2, input_fingerprint="g2"
        ).collect()
    }
    assert got3 == got1


def test_cc_resume_from_converged_round_with_exhausted_budget(spark, tmp_path):
    """Resuming over an already-converged round checkpoint whose round
    number equals (or exceeds) max_iter must CONVERGE, not raise: the
    resumed state's own signature seeds the fixpoint check, and the loop
    always gets at least one verification round."""
    from simhash_spark.operators.connected_components import _latest_cc_round
    from simhash_spark.sources.catalog import CheckpointCatalog

    pdf = pd.DataFrame(
        {"a": ["x1", "x2", "x3", "z1"], "b": ["x2", "x3", "x4", "z2"]}
    )
    df = spark.createDataFrame(pdf, schema="a string, b string")
    cat = CheckpointCatalog(spark, tmp_path / "cc_budget")
    got1 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            df, catalog=cat, ckpt_every=1, input_fingerprint="gb"
        ).collect()
    }
    latest = _latest_cc_round(cat, "gb")
    assert latest >= 1
    # budget exactly exhausted at the resume point: previously an empty (or
    # one-round) range could never see two equal signatures and raised
    got2 = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            df, max_iter=latest, catalog=cat, ckpt_every=1, input_fingerprint="gb"
        ).collect()
    }
    assert got2 == got1


def test_constraint_guard_is_per_session(spark):
    """The save/set/restore refcount is PER SparkSession: a nested guard on
    a second session must set/restore that session's own conf, and the
    outer session's restore must use the value saved from the outer
    session — never the other one's."""
    from simhash_spark.operators.connected_components import _constraints_disabled

    key = "spark.sql.constraintPropagation.enabled"
    s2 = spark.newSession()
    orig1, orig2 = spark.conf.get(key, "true"), s2.conf.get(key, "true")
    try:
        s2.conf.set(key, "true")  # make the sessions' values differ
        with _constraints_disabled(spark):
            assert spark.conf.get(key) == "false"
            assert s2.conf.get(key) == "true", "other session's conf was touched"
            with _constraints_disabled(s2):
                assert s2.conf.get(key) == "false"
            assert s2.conf.get(key) == "true", "inner restore used wrong session's save"
            assert spark.conf.get(key) == "false", "outer guard broken by inner exit"
        assert spark.conf.get(key) == orig1
    finally:
        spark.conf.set(key, orig1)
        s2.conf.set(key, orig2)
