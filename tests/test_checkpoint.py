"""Checkpointing tests: orbax round-trip, torch export/import, permissive load."""

import jax
import jax.numpy as jnp
import numpy as np

from td_vc_gan_tpu import config as cfg_mod
from td_vc_gan_tpu.training import checkpoint as ckpt


def small_cfg():
    cfg = cfg_mod.Config()
    cfg.model.generator.decoder_ratios = [4, 2, 2, 2]
    cfg.model.generator.decoder_channels = [16, 8, 8, 4, 4]
    cfg.model.generator.content_dim = 6
    cfg.model.generator.conditional_dim = 8
    cfg.model.generator.mrf_kernel_sizes = [3, 7, 11]
    cfg.model.generator.mrf_dilations = [1, 3, 5]
    cfg.model.discriminator.num_channels_base = 4
    cfg.train.max_segment = 320
    return cfg


def build_state(cfg, num_spk=4):
    from td_vc_gan_tpu.training.loop import build_models, init_params
    from td_vc_gan_tpu.training.state import create_train_state

    G, D, C = build_models(cfg, num_spk)
    pg, pd, pc, cp = init_params(cfg, G, D, C, 0, cfg.train.max_segment)
    state, opts = create_train_state(cfg, pg, pd, pc, cp)
    return state


class TestOrbax:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = small_cfg()
        cfg.log.val_lat_cls = True  # force C
        state = build_state(cfg)
        ckpt.save_orbax(state, tmp_path, epoch=3)
        assert ckpt.latest_epoch(tmp_path) == 3
        restored = ckpt.restore_orbax(state, tmp_path)
        same = jax.tree.map(
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            state.params_g, restored.params_g,
        )
        assert all(jax.tree.leaves(same))
        # optimizer state survives (reference drops it — SURVEY.md §5.4)
        assert jax.tree.structure(state.opt_g) == jax.tree.structure(restored.opt_g)


class TestTorchExportImport:
    def test_export_then_import_roundtrip(self, tmp_path):
        cfg = small_cfg()
        cfg.log.val_lat_cls = True
        state = build_state(cfg)
        ckpt.export_torch(state, cfg, tmp_path, epoch=7)
        for f in ["step7-G.pt", "step7-D.pt", "step7-C.pt", "latest-G.pt", "latest_epoch"]:
            assert (tmp_path / f).exists(), f

        params2, msg = ckpt.import_torch_generator(cfg, tmp_path / "latest-G.pt", state.params_g)
        assert not msg["mismatched_size"]
        same = jax.tree.map(
            lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
            state.params_g, params2,
        )
        assert all(jax.tree.leaves(same))

        pd2, _ = ckpt.import_torch_discriminator(cfg, tmp_path / "step7-D.pt", state.params_d)
        same_d = jax.tree.map(
            lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
            state.params_d, pd2,
        )
        assert all(jax.tree.leaves(same_d))


class TestLoadPossible:
    def test_matching_and_slicing(self):
        old = {"a": np.zeros((4, 6)), "b": {"c": np.zeros(3)}, "extra": np.ones(2)}
        new = {"a": np.ones((4, 8)), "b": {"c": np.full(3, 2.0)}, "unknown": np.ones(1)}
        merged, msg = ckpt.load_possible(old, new)
        assert msg["matched"] == ["b/c"]
        assert msg["mismatched_size"] == ["a"]
        assert msg["unmatched_keys"] == ["unknown"]
        assert msg["missing_keys"] == ["extra"]
        # min-shape slice copied (util/__init__.py:80-82)
        np.testing.assert_array_equal(merged["a"][:, :6], np.ones((4, 6)))
        np.testing.assert_array_equal(merged["b"]["c"], np.full(3, 2.0))
        np.testing.assert_array_equal(merged["extra"], np.ones(2))
