"""Train step with the WavLM SSL encoder path (wavlm-stage* configs):
frozen backbone inside the fused step, posterior encoder trainable."""

import jax
import jax.numpy as jnp
import numpy as np

from td_vc_gan_tpu import config as cfg_mod
from td_vc_gan_tpu.models import CollaborativeMultibandDiscriminator
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.models.generator import Generator
from td_vc_gan_tpu.models.wavlm import WavLMConfig
from td_vc_gan_tpu.training import state as state_mod
from td_vc_gan_tpu.training import step as step_mod

SEG = 1280
NUM_SPK = 4

TINY_WAVLM = WavLMConfig(
    extractor_mode="layer_norm",
    encoder_layers=2,
    encoder_embed_dim=32,
    encoder_ffn_embed_dim=64,
    encoder_attention_heads=4,
    layer_norm_first=True,
    # same layer geometry as WavLM-Large (WavLM.py:173) so the +160-pad
    # arithmetic lands exactly on T/320 frames; only channels are shrunk
    conv_feature_layers=((16, 10, 5),) + ((16, 3, 2),) * 4 + ((16, 2, 2),) * 2,
    conv_pos=16,
    conv_pos_groups=4,
    num_buckets=32,
    max_distance=80,
)


def test_wavlm_train_step_runs_and_freezes_backbone(rng):
    assert TINY_WAVLM.total_stride == 320  # frame rate matches the decoder

    cfg = cfg_mod.Config()
    cfg.model.generator.decoder_ratios = [10, 8, 2, 2]  # wavlm is fixed /320
    cfg.model.generator.decoder_channels = [16, 16, 8, 8, 4]
    cfg.model.generator.content_dim = 8
    cfg.model.generator.conditional_dim = 8
    cfg.model.generator.encoder_model = "wavlm"
    cfg.model.generator.num_enc_layers = 2
    cfg.model.generator.mrf_kernel_sizes = [3]
    cfg.model.generator.mrf_dilations = [1]
    cfg.model.discriminator.num_channels_base = 4
    cfg.train.max_segment = SEG
    cfg.train.batch_size = 2
    cfg.train.mel_fft_sizes = [512]
    cfg.train.lambda_rec = 0.0
    cfg.train.lambda_idt = 5.0
    cfg.train.lambda_f0 = 0.0
    cfg.train.lambda_cont_emb = 1.0

    G = Generator(
        decoder_ratios=(10, 8, 2, 2), decoder_channels=(16, 16, 8, 8, 4),
        num_bottleneck_layers=0, num_classes=NUM_SPK, conditional_dim=8,
        content_dim=8, encoder_model="wavlm", num_enc_layers=2,
        kernel_sizes=(3,), dilations=(1,), wavlm_cfg=TINY_WAVLM,
    )
    D = CollaborativeMultibandDiscriminator(num_disc=3, num_classes=NUM_SPK,
                                            num_channels_base=4)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, SEG, 1))
    oh = jax.nn.one_hot(jnp.zeros((1,), jnp.int32), NUM_SPK)
    pg = jax.jit(G.init)(key, x, oh, None, jnp.zeros((1, SEG, 1)))
    assert "wavlm" in pg["params"]["encoder"]
    pd = jax.jit(D.init)(key, x, jnp.zeros((1,), jnp.int32), D.get_subsamples(x, 3))
    cp = jax.jit(crepe_mod.init_crepe)(key)
    st, opts = state_mod.create_train_state(cfg, pg, pd, None, cp)

    ts = jax.jit(step_mod.build_train_step(cfg, G, D, None, opts))
    sigs = 0.2 * np.sin(
        2 * np.pi * np.array([150.0, 220.0])[:, None] * np.arange(SEG) / 16000
    ).astype(np.float32)
    batch = {
        "signal": jnp.asarray(sigs),
        "corrupted": jnp.asarray(sigs + 0.01 * rng.standard_normal(sigs.shape).astype(np.float32)),
        "label": jnp.asarray([0, 1], dtype=jnp.int32),
    }
    st2, metrics = ts(st, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k

    # frozen WavLM backbone untouched by the G optimizer
    same = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        st.params_g["params"]["encoder"]["wavlm"],
        st2.params_g["params"]["encoder"]["wavlm"],
    )
    assert all(jax.tree.leaves(same))
    # trainable posterior moved
    diff = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()),
        st.params_g["params"]["encoder"]["posterior"],
        st2.params_g["params"]["encoder"]["posterior"],
    )
    assert max(jax.tree.leaves(diff)) > 0
