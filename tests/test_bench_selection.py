"""bench.py variant selection: marker gating is batch-aware — a variant runs
at the largest batch a previous successful measurement attested (so an OOM
fallback's marker keeps the variant alive at its proven batch, ADVICE r2 #5)
— and the always-run baseline variant must survive with no markers at all."""

import importlib
import sys


def _load_bench(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, "/root/repo")
    import bench

    importlib.reload(bench)
    monkeypatch.setattr(bench, "MARKERS", tmp_path)
    return bench


class TestVariantSelection:
    def test_no_markers_runs_only_baseline(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDVC_BENCH_PRIME", raising=False)
        monkeypatch.delenv("TDVC_BENCH_CONFIG", raising=False)
        bench = _load_bench(tmp_path, monkeypatch)
        sel = bench._selected_variants()
        assert sel == [bench.VARIANTS[0]]

    def test_marker_with_matching_batch_enables_variant(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDVC_BENCH_PRIME", raising=False)
        monkeypatch.delenv("TDVC_BENCH_CONFIG", raising=False)
        bench = _load_bench(tmp_path, monkeypatch)
        name, _, _, batch, _ = bench.VARIANTS[1]
        (tmp_path / f"{name}_b{batch}").write_text("1.0\n")
        sel = bench._selected_variants()
        assert bench.VARIANTS[1] in sel and len(sel) == 2

    def test_fallback_batch_marker_keeps_variant_alive(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDVC_BENCH_PRIME", raising=False)
        monkeypatch.delenv("TDVC_BENCH_CONFIG", raising=False)
        bench = _load_bench(tmp_path, monkeypatch)
        name, cfg, dtype, batch, remat = bench.VARIANTS[1]
        # an OOM fallback attested batch//2: variant runs at that batch
        (tmp_path / f"{name}_b{batch // 2}").write_text("1.0\n")
        (tmp_path / name).write_text("1.0\n")  # legacy un-suffixed: ignored
        sel = bench._selected_variants()
        assert (name, cfg, dtype, batch // 2, remat) in sel and len(sel) == 2

    def test_attested_batch_capped_at_configured(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDVC_BENCH_PRIME", raising=False)
        monkeypatch.delenv("TDVC_BENCH_CONFIG", raising=False)
        bench = _load_bench(tmp_path, monkeypatch)
        name, _, _, batch, _ = bench.VARIANTS[1]
        (tmp_path / f"{name}_b{batch * 4}").write_text("1.0\n")
        sel = bench._selected_variants()
        # a marker from a larger-batch prime never raises above configured
        assert bench.VARIANTS[1] in sel and len(sel) == 2

    def test_prime_all_selects_everything(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TDVC_BENCH_PRIME", "all")
        monkeypatch.delenv("TDVC_BENCH_CONFIG", raising=False)
        bench = _load_bench(tmp_path, monkeypatch)
        assert bench._selected_variants() == bench.VARIANTS

    def test_explicit_config_env(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDVC_BENCH_PRIME", raising=False)
        monkeypatch.setenv("TDVC_BENCH_CONFIG", "/x/y/myconf.yaml")
        monkeypatch.setenv("TDVC_BENCH_DTYPE", "bfloat16")
        monkeypatch.setenv("TDVC_BENCH_BATCH", "4")
        monkeypatch.setenv("TDVC_BENCH_REMAT", "0")
        bench = _load_bench(tmp_path, monkeypatch)
        ((name, cfg, dtype, batch, remat),) = bench._selected_variants()
        assert name == "myconf_bfloat16" and dtype == "bfloat16"
        assert batch == 4 and remat is False and cfg.endswith("myconf.yaml")


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
