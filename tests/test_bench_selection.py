"""bench.py timeout-proofing (round-3 VERDICT next #1 + #8).

Covers: headline-first selection (the flagship runs with no markers at all),
hash-stamped marker gating (stale markers re-budget as cold and warn),
batch-aware OOM-fallback markers (ADVICE r2 #5), the per-variant incremental
JSON emission (a kill mid-run leaves the best-so-far parseable), and the
wall-clock budget skipping enrolment — the round-3 driver bench died at
rc=124 with ZERO output; these tests pin the machinery that prevents that.
"""

import importlib
import json
import sys

import jax


def _load_bench(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, "/root/repo")
    import bench

    importlib.reload(bench)
    # bench points the persistent cache at the TPU dir; tests must not
    # pollute the committed .jax_cache with CPU entries
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
    monkeypatch.setattr(bench, "MARKERS", tmp_path)
    monkeypatch.delenv("TDVC_BENCH_PRIME", raising=False)
    monkeypatch.delenv("TDVC_BENCH_CONFIG", raising=False)
    monkeypatch.delenv("TDVC_BENCH_BUDGET_S", raising=False)
    return bench


HASH = "f" * 16  # stands in for the current-source hash in selection tests


class TestVariantSelection:
    def test_no_markers_runs_only_headline(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        sel = bench._selected_variants(HASH)
        assert sel == [bench.VARIANTS[0] + (False,)]
        assert sel[0][0] == bench.HEADLINE == "wavlm_bf16_noremat"

    def test_headline_is_first_even_with_all_markers(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        for name, _, _, batch, _ in bench.VARIANTS:
            (tmp_path / f"{name}_b{batch}").write_text(f"1.0\n{HASH}\n")
        sel = bench._selected_variants(HASH)
        assert [v[0] for v in sel] == [v[0] for v in bench.VARIANTS]
        assert all(v[5] for v in sel)  # fresh hash -> warm budget

    def test_fresh_marker_enables_variant_warm(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        name, cfg, dtype, batch, remat = bench.VARIANTS[1]
        (tmp_path / f"{name}_b{batch}").write_text(f"1.0\n{HASH}\n")
        sel = bench._selected_variants(HASH)
        assert (name, cfg, dtype, batch, remat, True) in sel and len(sel) == 2

    def test_stale_marker_budgets_cold_and_warns(self, tmp_path, monkeypatch, capsys):
        bench = _load_bench(tmp_path, monkeypatch)
        name, cfg, dtype, batch, remat = bench.VARIANTS[1]
        (tmp_path / f"{name}_b{batch}").write_text("1.0\nsomeoldhash0000\n")
        sel = bench._selected_variants(HASH)
        assert (name, cfg, dtype, batch, remat, False) in sel
        assert "predates the current source tree" in capsys.readouterr().err

    def test_legacy_hashless_marker_budgets_cold(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        name, cfg, dtype, batch, remat = bench.VARIANTS[1]
        (tmp_path / f"{name}_b{batch}").write_text("1.0\n")
        sel = bench._selected_variants(HASH)
        assert (name, cfg, dtype, batch, remat, False) in sel

    def test_fallback_batch_marker_keeps_variant_alive(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        name, cfg, dtype, batch, remat = bench.VARIANTS[1]
        # an OOM fallback attested batch//2: variant runs at that batch
        (tmp_path / f"{name}_b{batch // 2}").write_text(f"1.0\n{HASH}\n")
        (tmp_path / name).write_text("1.0\n")  # legacy un-suffixed: ignored
        sel = bench._selected_variants(HASH)
        assert (name, cfg, dtype, batch // 2, remat, True) in sel and len(sel) == 2

    def test_attested_batch_capped_at_configured(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        name, _, _, batch, _ = bench.VARIANTS[1]
        (tmp_path / f"{name}_b{batch * 4}").write_text(f"1.0\n{HASH}\n")
        sel = bench._selected_variants(HASH)
        # a marker from a larger-batch prime never raises above configured
        assert bench.VARIANTS[1] + (True,) in sel and len(sel) == 2

    def test_prime_all_selects_everything(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TDVC_BENCH_PRIME", "all")
        bench = _load_bench(tmp_path, monkeypatch)
        monkeypatch.setenv("TDVC_BENCH_PRIME", "all")
        assert bench._selected_variants(HASH) == [v + (False,) for v in bench.VARIANTS]
        assert bench._budget_s() == float("inf")

    def test_explicit_config_env(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        monkeypatch.setenv("TDVC_BENCH_CONFIG", "/x/y/myconf.yaml")
        monkeypatch.setenv("TDVC_BENCH_DTYPE", "bfloat16")
        monkeypatch.setenv("TDVC_BENCH_BATCH", "4")
        monkeypatch.setenv("TDVC_BENCH_REMAT", "0")
        ((name, cfg, dtype, batch, remat, warm),) = bench._selected_variants(HASH)
        assert name == "myconf_bfloat16" and dtype == "bfloat16"
        assert batch == 4 and remat is False and cfg.endswith("myconf.yaml")

    def test_src_hash_is_stable_and_short(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        h1, h2 = bench._src_hash(), bench._src_hash()
        assert h1 == h2 and len(h1) == 16

    def test_marker_roundtrip(self, tmp_path, monkeypatch):
        bench = _load_bench(tmp_path, monkeypatch)
        bench._write_marker("v", 64, 123456.78, HASH)
        sps, mhash = bench._read_marker(tmp_path / "v_b64")
        assert abs(sps - 123456.8) < 0.11 and mhash == HASH


def _fake_spawn(results_log):
    """A _spawn_stage stand-in: instant, per-variant deterministic numbers.

    The real _spawn_stage runs the stage in a timeout-bounded subprocess
    (hung relay compiles, see bench.py); tests fake at this seam so main()'s
    orchestration — ordering, budget, marker writes, incremental emission —
    runs for real without devices.
    """
    def fake(spec, timeout_s):
        parts = spec.split("|")
        results_log.append((parts, timeout_s))
        assert timeout_s >= 60.0
        if parts[0] == "variant":
            batch = int(parts[4])
            sps = 1_000_000.0 + 1000 * batch + (0 if parts[5] == "1" else 5)
            return {"stage": "variant", "name": parts[1],
                    "samples_per_sec": sps,
                    "step_seconds": batch * 8960 / sps, "batch": batch}
        if parts[0] == "rtf":
            return {"stage": "rtf", "rtf": 500.0}
        raise AssertionError(spec)
    return fake


class TestIncrementalEmission:
    def _run_main(self, bench, monkeypatch, capsys):
        log = []
        monkeypatch.setattr(bench, "_spawn_stage", _fake_spawn(log))
        monkeypatch.setattr(bench, "bench_corruption", lambda *a, **k: 400.0)
        monkeypatch.setattr(bench, "bench_replay", lambda *a, **k: 6000.0)
        bench.main()
        out = capsys.readouterr().out
        lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
        return lines, log

    def test_line_per_variant_and_final_extras(self, tmp_path, monkeypatch, capsys):
        """Every successful variant flushes a COMPLETE parseable result line
        (the round-3 fix: a mid-run kill leaves the best-so-far, not rc=124
        with nothing); the final line adds the RTF/host extras."""
        bench = _load_bench(tmp_path, monkeypatch)
        for name, _, _, batch, _ in bench.VARIANTS:
            (tmp_path / f"{name}_b{batch}").write_text(f"1.0\n{bench._src_hash()}\n")
        lines, log = self._run_main(bench, monkeypatch, capsys)
        # one line per variant + one after the RTF stage (which runs right
        # after the headline since round 5) + the final line
        assert len(lines) == len(bench.VARIANTS) + 2
        for l in lines:
            assert l["metric"] == "stage2_train_throughput"
            assert l["value"] > 0 and l["vs_baseline"] > 0
        # first line already carries the headline variant — kill-safe
        assert lines[0]["headline_variant"] == bench.HEADLINE
        assert lines[0]["variants"][bench.HEADLINE]["batch"] == 64
        final = lines[-1]
        assert final["conversion_rtf_x_realtime"] == 500.0
        assert final["replay_items_per_sec_per_core"] == 6000.0
        assert final["input_feed_margin_8chip_dp_precorrupted"] > 0
        assert len(final["variants"]) == len(bench.VARIANTS)

    def test_markers_written_with_hash(self, tmp_path, monkeypatch, capsys):
        bench = _load_bench(tmp_path, monkeypatch)
        lines, _ = self._run_main(bench, monkeypatch, capsys)
        sps, mhash = bench._read_marker(tmp_path / f"{bench.HEADLINE}_b64")
        assert mhash == bench._src_hash() and sps > 0

    def test_zero_budget_still_lands_headline(self, tmp_path, monkeypatch, capsys):
        """The headline is NEVER budget-skipped (a partial line beats no
        line); everything else — variants and extras — is."""
        monkeypatch.setenv("TDVC_BENCH_BUDGET_S", "0")
        bench = _load_bench(tmp_path, monkeypatch)
        monkeypatch.setenv("TDVC_BENCH_BUDGET_S", "0")
        for name, _, _, batch, _ in bench.VARIANTS:
            (tmp_path / f"{name}_b{batch}").write_text(f"1.0\n{bench._src_hash()}\n")
        lines, log = self._run_main(bench, monkeypatch, capsys)
        assert len(log) == 1  # only the headline actually benched
        final = lines[-1]
        assert final["headline_variant"] == bench.HEADLINE
        assert final["vs_baseline"] > 0
        skipped = set(final["skipped_for_budget"])
        assert {v[0] for v in bench.VARIANTS[1:]} <= skipped
        assert "rtf" in skipped
        assert final["conversion_rtf_x_realtime"] is None
        # host-feed stages run FIRST and unconditionally (round-5: they are
        # CPU-only and the VERDICT-named fields must never be budget-lost)
        assert "corruption" not in skipped
        assert final["replay_items_per_sec_per_core"] == 6000.0

    def test_hung_stage_recorded_and_run_continues(self, tmp_path, monkeypatch, capsys):
        """A stage timeout (the observed hung-relay-compile failure mode)
        must cost only that stage: the error is recorded, later variants
        still run, and the final line is complete."""
        bench = _load_bench(tmp_path, monkeypatch)
        for name, _, _, batch, _ in bench.VARIANTS:
            (tmp_path / f"{name}_b{batch}").write_text(f"1.0\n{bench._src_hash()}\n")

        real = _fake_spawn([])

        def hangs_on_headline(spec, timeout_s):
            if f"|{bench.HEADLINE}|" in spec:
                return {"error": f"timeout after {timeout_s:.0f}s"}
            return real(spec, timeout_s)

        monkeypatch.setattr(bench, "_spawn_stage", hangs_on_headline)
        monkeypatch.setattr(bench, "bench_corruption", lambda *a, **k: 400.0)
        monkeypatch.setattr(bench, "bench_replay", lambda *a, **k: 6000.0)
        bench.main()
        out = capsys.readouterr().out
        lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
        final = lines[-1]
        assert "timeout" in final["variants"][bench.HEADLINE]["error"]
        assert final["headline_variant"] == "conv_enc_bf16_noremat"  # next best
        assert final["conversion_rtf_x_realtime"] == 500.0
        # the hung variant's stale marker was not overwritten
        sps, _ = bench._read_marker(tmp_path / f"{bench.HEADLINE}_b64")
        assert sps == 1.0

    def test_child_stage_oom_fallback_halves_batch(self, tmp_path, monkeypatch, capsys):
        """The OOM-fallback loop lives in the stage CHILD: batch halves
        in-process and the child reports the batch that fit."""
        bench = _load_bench(tmp_path, monkeypatch)
        calls = []

        def flaky(config, dtype, batch, remat=True, **kw):
            calls.append(batch)
            if batch > 32:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
            sps = 500_000.0
            return sps, batch * 8960 / sps, object(), object(), object()

        monkeypatch.setattr(bench, "bench_train", flaky)
        bench._run_stage(f"variant|{bench.HEADLINE}|/x.yaml|bfloat16|64|0")
        out = capsys.readouterr()
        assert calls == [64, 32]
        res = json.loads(out.out.splitlines()[-1])
        assert res["batch"] == 32 and res["samples_per_sec"] == 500_000.0
        assert "failed" in out.err

    def test_child_stage_all_oom_reports_error(self, tmp_path, monkeypatch, capsys):
        bench = _load_bench(tmp_path, monkeypatch)

        def always_oom(*a, **kw):
            raise RuntimeError("RESOURCE_EXHAUSTED")

        monkeypatch.setattr(bench, "bench_train", always_oom)
        bench._run_stage("variant|v|/x.yaml|float32|4|1")
        res = json.loads(capsys.readouterr().out.splitlines()[-1])
        assert "RESOURCE_EXHAUSTED" in res["error"]

    def test_spawn_stage_roundtrip_subprocess(self, tmp_path, monkeypatch):
        """_spawn_stage really isolates a stage in a subprocess and parses
        its json line; an unknown stage surfaces as an error, not a hang."""
        bench = _load_bench(tmp_path, monkeypatch)
        res = bench._spawn_stage("bogus|x", 60.0)
        assert "error" in res


class TestReplayBench:
    def test_replay_throughput_positive_and_beats_inline(self, tmp_path, monkeypatch):
        """bench_replay measures the precorrupted replay path end to end on
        a self-built dataset; it must run and (being a read + gain/flip/crop
        instead of TD-PSOLA + 10-band EQ) beat the inline corruption rate."""
        bench = _load_bench(tmp_path, monkeypatch)
        replay = bench.bench_replay(items=12)
        inline = bench.bench_corruption(items=12)
        assert replay > 0 and inline > 0
        assert replay > inline
