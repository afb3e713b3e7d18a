"""WavLM parity: import the reference torch WavLM (never copied), build a
random small checkpoint, convert, and compare features numerically."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from wavlm.WavLM import WavLM as TorchWavLM, WavLMConfig as TorchWavLMConfig  # noqa: E402

from td_vc_gan_tpu.models import wavlm as jwavlm  # noqa: E402
from td_vc_gan_tpu.models.ssl_encoder import SSLEncoder  # noqa: E402


SMALL = dict(
    extractor_mode="layer_norm",
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=128,
    encoder_attention_heads=4,
    layer_norm_first=True,
    conv_feature_layers="[(16,10,5), (16,4,4)]",
    conv_bias=False,
    conv_pos=16,
    conv_pos_groups=4,
    relative_position_embedding=True,
    num_buckets=32,
    max_distance=80,
    gru_rel_pos=True,
    dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    dropout_input=0.0,
    dropout_features=0.0,
    encoder_layerdrop=0.0,
    mask_prob=0.0,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchWavLM(TorchWavLMConfig(SMALL))
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(torch_model, tmp_path_factory):
    path = tmp_path_factory.mktemp("wavlm") / "small.pt"
    torch.save({"cfg": SMALL, "model": torch_model.state_dict()}, path)
    return jwavlm.load_wavlm_checkpoint(path)


class TestWavLMParity:
    def test_config_parsed(self, converted):
        cfg, _ = converted
        assert cfg.encoder_layers == 2
        assert cfg.conv_feature_layers == ((16, 10, 5), (16, 4, 4))
        assert cfg.total_stride == 20

    def test_param_shapes_match_random_init(self, converted, rng):
        cfg, params = converted
        model = jwavlm.WavLM(cfg)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 400)))
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, ref)

    def test_features_match_torch(self, converted, torch_model, rng):
        cfg, params = converted
        x = (0.1 * rng.standard_normal((2, 2000))).astype(np.float32)
        with torch.no_grad():
            ref, _ = torch_model.extract_features(torch.from_numpy(x))
        ours = jwavlm.WavLM(cfg).apply(params, jnp.asarray(x))
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=5e-4)

    def test_bucket_function_matches_reference(self):
        # reference bucket fn lives on the torch attention module
        from wavlm.modules import MultiheadAttention as TorchMHA

        mha = TorchMHA(64, 4, has_relative_attention_bias=True, num_buckets=32,
                       max_distance=80)
        rel = torch.arange(50)[None, :] - torch.arange(50)[:, None]
        ref = mha._relative_positions_bucket(rel, bidirectional=True).numpy()
        ours = jwavlm._relative_position_buckets(50, 32, 80)
        np.testing.assert_array_equal(ours, ref)


class TestSSLEncoder:
    def test_end_to_end_with_small_wavlm(self, converted, rng):
        cfg, wavlm_params = converted
        enc = SSLEncoder(num_layers=2, emb_dim=8, wavlm_cfg=cfg)
        x = jnp.asarray(0.1 * rng.standard_normal((1, 2000, 1)).astype(np.float32))
        out, params = enc.init_with_output(jax.random.PRNGKey(0), x)
        # conv stack on 2160 samples: (2160-10)//5+1=431 -> (431-4)//4+1=107
        assert out.shape == (1, 107, 8)

        # splice in the converted wavlm params and re-run
        params = jax.tree.map(lambda a: a, params)
        params["params"]["wavlm"] = wavlm_params["params"]
        out2 = enc.apply(params, x)
        assert np.isfinite(np.asarray(out2)).all()

    def test_wavlm_frozen_no_grad(self, converted, rng):
        cfg, _ = converted
        enc = SSLEncoder(num_layers=2, emb_dim=8, wavlm_cfg=cfg)
        x = jnp.asarray(0.1 * rng.standard_normal((1, 400, 1)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.mean(enc.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        wavlm_grads = jax.tree.leaves(g["params"]["wavlm"])
        assert all(float(np.abs(np.asarray(t)).max()) == 0.0 for t in wavlm_grads)
        post_grads = jax.tree.leaves(g["params"]["posterior"])
        assert any(float(np.abs(np.asarray(t)).max()) > 0 for t in post_grads)


class TestWavLMBf16:
    def test_bf16_backbone_close_to_f32(self, converted, rng):
        """compute_dtype='bfloat16' on the frozen backbone: f32 output dtype,
        small relative error vs the f32 path."""
        import dataclasses

        cfg, params = converted
        cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
        x = jnp.asarray(0.1 * rng.standard_normal((2, 1600)), jnp.float32)

        f32 = jax.jit(lambda p, a: jwavlm.WavLM(cfg).apply(p, a))(params, x)
        bf16 = jax.jit(lambda p, a: jwavlm.WavLM(cfg16).apply(p, a))(params, x)
        assert bf16.dtype == jnp.float32
        denom = float(jnp.abs(f32).mean()) + 1e-9
        rel = float(jnp.abs(bf16 - f32).mean()) / denom
        assert rel < 0.15, rel
