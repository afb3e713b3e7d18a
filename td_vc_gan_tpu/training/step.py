"""The fused GAN train step: D-update + C-update + G-update in one XLA program.

Re-architecture of the reference's per-iteration loop (train.py:208-521) as a
single jitted, shardable function:

- CREPE pitch extraction, excitation synthesis, F0 statistics, all losses and
  all three optimizer updates run on device in one compiled program — no host
  round-trips (the reference crosses the host boundary for CREPE preprocess,
  excitation numpy ops, permutations, and each optimizer step).
- The generator forward for the D update reuses the same parameters as the
  G update, so we compute it once under stop_gradient instead of twice
  (train.py:262 vs :322 run the identical forward back-to-back); the G
  adversarial loss still sees the *updated* discriminator, preserving the
  reference's update ordering exactly.
- Data parallelism: jit with batch-sharded inputs over a ('data',) mesh;
  XLA inserts psum for the gradient all-reduce over ICI.

Intentional behavior fixes vs the reference (all dormant under shipped λs):
- the identity wave-L1 term is weighted by λ_idt (the reference adds it to
  the *rec* loss, train.py:384);
- the 'converted' contrastive term is actually added to the loss (the
  reference adds it to itself and drops it, train.py:413).
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable

import jax
import jax.numpy as jnp
import optax

from td_vc_gan_tpu.config import Config
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.ops import dsp, losses
from td_vc_gan_tpu.training.state import TrainState


def _f0_log_mean(f0: jnp.ndarray) -> jnp.ndarray:
    """Voiced-frame mean of log F0 (train.py:247-248): (B, F) -> (B, 1)."""
    voiced = f0 > 0
    return jnp.sum(voiced * jnp.log(f0 + 1e-6), -1, keepdims=True) / (
        jnp.sum(voiced, -1, keepdims=True) + 1e-6
    )


def compute_pitch_features(crepe_params, signal, perm, rng, sample_rate, no_conv):
    """F0s, pitch-shifted activation targets, and excitations for one batch.

    signal: (B, T). Returns dict with f0_src, act_conv_tgt, exc_conv, exc_src.
    Mirrors train.py:239-256.
    """
    k1, k2 = jax.random.split(rng)
    f0_src, act_src = crepe_mod.filtered_pitch(crepe_params, signal)
    f0_src = jax.lax.stop_gradient(f0_src)
    act_src = jax.lax.stop_gradient(act_src)

    if no_conv:
        f0_conv, act_conv_tgt = f0_src, act_src
    else:
        f0_tgt = f0_src[perm]
        mu_tgt = _f0_log_mean(f0_tgt)
        mu_src = _f0_log_mean(f0_src)
        f0_conv = jnp.where(
            f0_src > 0, jnp.exp(jnp.log(f0_src + 1e-6) + mu_tgt - mu_src), 0.0
        )
        shift = crepe_mod.get_shift(jnp.exp(mu_src)[:, 0], jnp.exp(mu_tgt)[:, 0])
        act_conv_tgt = dsp.roll_batches(act_src, shift, axis=2)

    exc_conv = dsp.f0_to_excitation(f0_conv, 64, k1, sample_rate)[..., None]
    exc_src = dsp.f0_to_excitation(f0_src, 64, k2, sample_rate)[..., None]
    return dict(
        f0_src=f0_src, f0_conv=f0_conv, act_conv_tgt=act_conv_tgt,
        exc_conv=exc_conv, exc_src=exc_src,
    )


def _maybe_interval(step, interval, update_fn, noop_fn, *args):
    """Apply ``update_fn`` every ``interval`` steps (train.py:259,320)."""
    if interval <= 1:
        return update_fn(*args)
    return jax.lax.cond(step % interval == 0, update_fn, noop_fn, *args)


def _f32_metrics(tree):
    """Canonicalize metric leaves to non-weak f32 scalars so lax.cond
    branches (update vs noop) have identical output avals."""
    return jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), tree)


def _zero_metrics_like(fn, *args):
    """Zero metrics tree shaped by abstract evaluation only — the noop
    branches of interval-gated updates must not pay for a full loss forward
    (the reference simply skips the iteration, train.py:259,320). All
    metric leaves are scalar f32 after _f32_metrics."""
    shapes = jax.eval_shape(fn, *args)
    return jax.tree.map(lambda s: jnp.zeros((), jnp.float32), shapes)


def build_train_step(cfg: Config, G, D, C, optimizers, mesh=None) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict(signal (B, T) float32, corrupted (B, T) float32 [optional],
    label (B,) int32). All shapes static.

    ``mesh``: the data-parallel Mesh when the step will be jitted with
    sharded inputs. GSPMD cannot batch-partition the discriminator's
    grouped downsample convs — it all-gathers the 2B batch and runs the
    whole D fwd+bwd replicated on every device (measured +7%/+20%
    per-device FLOPs at n=2/n=8, found by the weak scaling sweep's
    flatness assertion). With the mesh in scope, grouped convs run under
    shard_map on their local batch shard instead — exact math, zero
    forward collectives (models/layers.py spmd_mesh_scope).
    """
    from td_vc_gan_tpu import perf

    t = cfg.train
    # program-shaping flags come from the typed config (round-4; TDVC_* env
    # vars remain explicit per-process A/B overrides — see perf.py). The
    # scope is (re)activated inside train_step so flags bind at TRACE time
    # for this step regardless of what else the process traced in between.
    pflags = perf.from_config(cfg)
    g_opt, d_opt, c_opt = optimizers

    use_c = C is not None and (t.lambda_latcls != 0 or cfg.log.val_lat_cls)
    num_classes = G.num_classes
    num_disc = cfg.model.discriminator.num_disc
    sr = cfg.model.sample_rate
    fft_sizes = tuple(t.mel_fft_sizes)

    # Weight-norm hoisting: all applies below consume plain effective
    # kernels (G_k/D_k are the use_weight_norm=False twins of G/D); the
    # v,g -> kernel reconstruction runs ONCE per step via training.kernelize
    # and its backward chains through a single vjp instead of per-apply
    # norm/divide/multiply chains (hundreds of tiny ops each).
    from td_vc_gan_tpu.training import kernelize as kern_mod

    G_k = G.clone(weight_norm=(False, False, False))
    D_k = D.clone(use_weight_norm=False)

    # Rematerialize the big sub-network applies inside the G-gradient: the
    # fused step holds 3-4 generator + 5 discriminator forwards alive for the
    # backward pass; recompute-on-backward (policy: save nothing) trades ~25%
    # extra FLOPs for the HBM headroom that large batches need (HLO temps
    # dominated by full-rate FiLM cond convs). cfg.train.remat=False skips
    # the recompute — measurably faster when the batch fits HBM.
    _g_raw = lambda pgk, x, c_tgt, exc: G_k.apply(pgk, x, c_tgt, None, exc)
    _d_raw = lambda pdk, x, labels, subs: D_k.apply(pdk, x, labels, tuple(subs))

    # Shared-encoder pair forward: the conversion and identity passes decode
    # the SAME source signal, and this step's encoder is unconditioned
    # (c_src=None above), so encode x once and decode both passes at 2B from
    # the same embedding — identical math (the content crossing the boundary
    # is f32-finalized either way, see Generator.__call__), one encoder
    # fwd+bwd instead of two. cfg.train.shared_enc=False (or the
    # TDVC_SHARED_ENC=0 override) restores the 2B encode for A/B.
    def _g_pair_raw(pgk, x, c2, exc2):
        cont = G_k.apply(pgk, x, None, None, None, encode_only=True)
        cont2 = jnp.concatenate([cont, cont], 0)
        return G_k.apply(pgk, None, c2, None, exc2, content=cont2)

    if getattr(t, "remat", True):
        g_apply = jax.checkpoint(_g_raw, static_argnums=())
        g_pair_apply = jax.checkpoint(_g_pair_raw, static_argnums=())
        d_apply = jax.checkpoint(_d_raw)
    else:
        g_apply, g_pair_apply, d_apply = _g_raw, _g_pair_raw, _d_raw
    if not perf.enabled("shared_enc", pflags):
        g_pair_apply = lambda pgk, x, c2, exc2: g_apply(
            pgk, jnp.concatenate([x, x], 0), c2, exc2)

    # mixed-precision policy (cfg.train.compute_dtype): G/D/C convs run with
    # bf16 inputs + bf16 inter-layer activations under this scope; params,
    # optimizer state and every loss stay f32 (top-level modules cast their
    # outputs back — models/layers.py finalize_dtype).
    from td_vc_gan_tpu.models.layers import compute_dtype_scope, spmd_mesh_scope

    compute_dtype = getattr(t, "compute_dtype", None)

    def train_step(state: TrainState, batch, rng):
        with perf.flags_scope(pflags), spmd_mesh_scope(mesh), \
                compute_dtype_scope(compute_dtype):
            return _train_step_body(state, batch, rng)

    def _train_step_body(state: TrainState, batch, rng):
        signal = batch["signal"]
        label_src = batch["label"]
        x = signal[..., None]
        b = signal.shape[0]
        metrics = {}

        keys = jax.random.split(rng, 8)
        (k_perm, k_pitch, k_jit, k_cont1, k_cont2, _, _, _) = keys

        c_src = jax.nn.one_hot(label_src, num_classes)
        if t.no_conv:
            perm = jnp.arange(b)
            label_tgt = label_src
        else:
            perm = jax.random.permutation(k_perm, b)
            label_tgt = label_src[perm]
        c_tgt = jax.nn.one_hot(label_tgt, num_classes)

        pf = compute_pitch_features(state.crepe_params, signal, perm, k_pitch, sr, t.no_conv)
        exc_conv, exc_src, act_conv_tgt = pf["exc_conv"], pf["exc_src"], pf["act_conv_tgt"]

        # ---- generator forward ONCE, via vjp so the primal is shared ----
        # The same (fake, subs, cont) serves the D update (stop-gradient) and
        # the G loss (differentiated): grads w.r.t. the fake-path outputs are
        # pulled back through g_fake_vjp and added to the direct param grads.
        # This removes the duplicate forward the reference runs back-to-back
        # (train.py:262 vs :322) without changing the update ordering.
        #
        # TPU batching: the identity pass G(x, c_src, exc_src) is independent
        # of the conversion pass, so both ride ONE generator application at
        # batch 2B — identical math, half the kernel launches/DMA stalls of
        # two applies (the step is overhead-bound, see bench.py notes).
        batch_idt = (not t.no_conv) and t.lambda_idt > 0
        if batch_idt:
            # encoded ONCE inside g_pair_apply; decoded at 2B
            g_c = jnp.concatenate([c_tgt, c_src], 0)
            g_exc = jnp.concatenate([exc_conv, exc_src], 0)
        else:
            g_c, g_exc = c_tgt, exc_conv

        # hoisted weight-norm reconstruction (compile-time structure probes;
        # ShapeDtypeStructs keep eval_shape free of traced values)
        f32 = jnp.float32
        sds = jax.ShapeDtypeStruct
        g_tgt = jax.eval_shape(
            G_k.init, sds((2,), jnp.uint32),
            sds((1, x.shape[1], 1), f32), sds((1, num_classes), f32),
            None, sds((1, x.shape[1], 1), f32),
        )
        pgk0, g_kern_vjp = jax.vjp(
            lambda pg: kern_mod.kernelize(pg, g_tgt), state.params_g
        )

        if batch_idt:
            (gout0, gsubs0, gcont0), g_fake_vjp = jax.vjp(
                lambda pgk: g_pair_apply(pgk, x, g_c, g_exc), pgk0
            )
        else:
            (gout0, gsubs0, gcont0), g_fake_vjp = jax.vjp(
                lambda pgk: g_apply(pgk, x, g_c, g_exc), pgk0
            )
        fake0 = gout0[:b]
        subs0 = [s[:b] for s in gsubs0]
        cont0 = gcont0[:b]
        fake_sg = jax.lax.stop_gradient(fake0)
        subs_sg = [jax.lax.stop_gradient(s) for s in subs0]
        cont_sg = jax.lax.stop_gradient(cont0)

        # ---- discriminator update (real+fake in one batched D apply) ----
        real_subs = D.get_subsamples(x, num_disc)
        d_tgt = jax.eval_shape(
            D_k.init, sds((2,), jnp.uint32),
            sds((1, x.shape[1], 1), f32), sds((1,), jnp.int32),
            tuple(sds((1,) + s.shape[1:], f32) for s in real_subs),
        )

        def d_loss_fn(pd):
            outs, _ = D_k.apply(
                kern_mod.kernelize(pd, d_tgt),
                jnp.concatenate([x, fake_sg], 0),
                jnp.concatenate([label_src, label_tgt], 0),
                [jnp.concatenate([r, f], 0) for r, f in zip(real_subs, subs_sg)],
            )
            out_real = [o[:b] for o in outs]
            out_fake = [o[b:] for o in outs]
            l_real, l_fake, per_r, per_f = losses.lsgan_d_loss(out_real, out_fake)
            aux = {"D_loss_adv_real": l_real, "D_loss_adv_fake": l_fake}
            for i, (r, f) in enumerate(zip(per_r, per_f)):
                aux[f"D_loss_adv_real_{i}"] = r
                aux[f"D_loss_adv_fake_{i}"] = f
            return l_real + l_fake, aux

        def d_update(pd, od):
            (d_loss, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(pd)
            updates, od_new = d_opt.update(d_grads, od, pd)
            d_aux["D_loss"] = d_loss
            return optax.apply_updates(pd, updates), od_new, _f32_metrics(d_aux)

        def d_noop(pd, od):
            d_aux = _zero_metrics_like(lambda p: d_loss_fn(p)[1], pd)
            d_aux["D_loss"] = jnp.zeros((), jnp.float32)
            return pd, od, d_aux

        params_d, opt_d, d_metrics = _maybe_interval(
            state.step, t.D_step_interval, d_update, d_noop, state.params_d, state.opt_d
        )
        metrics.update(d_metrics)

        # ---- latent-classifier update (train.py:299-309) ----
        params_c, opt_c = state.params_c, state.opt_c
        if use_c:
            def c_loss_fn(pc):
                logits = C.apply(pc, cont_sg)
                return losses.cross_entropy_loss(logits, label_src), logits

            def c_update(pc, oc):
                (c_loss, logits), c_grads = jax.value_and_grad(c_loss_fn, has_aux=True)(pc)
                updates, oc_new = c_opt.update(c_grads, oc, pc)
                acc = jnp.mean(jnp.argmax(logits, -1) == label_src)
                return optax.apply_updates(pc, updates), oc_new, {"C_loss": c_loss, "C_acc": acc}

            def c_noop(pc, oc):
                return pc, oc, {"C_loss": jnp.zeros(()), "C_acc": jnp.zeros(())}

            params_c, opt_c, c_metrics = _maybe_interval(
                state.step, t.D_step_interval, c_update, c_noop, params_c, opt_c
            )
            metrics.update(c_metrics)

        # ---- generator update (sees the UPDATED D and C) ----
        # All same-shaped discriminator evaluations the G loss needs (adv on
        # fake, feature targets on jittered real, rec, idt) ride ONE batched
        # D apply — identical math to the reference's four separate calls
        # (train.py:330-390), a fraction of the kernel count.
        pdk_g = kern_mod.kernelize(jax.lax.stop_gradient(params_d), d_tgt)

        def g_loss_fn(pgk, gout, gsubs, gcont):
            aux = {}
            fake = gout[:b]
            subs = [s[:b] for s in gsubs]
            cont = gcont[:b]

            use_rec = (not t.no_conv) and t.lambda_rec > 0
            use_idt = t.lambda_idt > 0
            real_j = x
            if (t.lambda_rec > 0 or t.lambda_idt > 0) and t.jitter_amp > 0:
                real_j = dsp.add_jitter(signal, t.jitter_amp, k_jit)[..., None]

            parts = [("adv", fake, label_tgt, subs)]
            if t.lambda_feat > 0 and (use_rec or use_idt):
                parts.append(
                    ("real", real_j, label_src, D.get_subsamples(real_j, num_disc))
                )
            rec = cont_rec = None
            if use_rec:
                rec, rec_subs, cont_rec = g_apply(
                    pgk, jax.lax.stop_gradient(fake), c_src, exc_src
                )
                if t.lambda_feat > 0:
                    parts.append(("rec", rec, label_src, rec_subs))
            idt = idt_subs = None
            if use_idt and batch_idt:
                idt = gout[b:]
                idt_subs = [s[b:] for s in gsubs]
                if t.lambda_feat > 0:
                    parts.append(("idt", idt, label_src, idt_subs))
            elif use_idt:  # no_conv: the identity pass IS the conversion pass
                idt, idt_subs = fake, subs

            outs_all, feats_all = d_apply(
                pdk_g,
                jnp.concatenate([p[1] for p in parts], 0),
                jnp.concatenate([p[2] for p in parts], 0),
                [jnp.concatenate(ss, 0) for ss in zip(*(p[3] for p in parts))],
            )
            index = {name: i for i, (name, *_) in enumerate(parts)}

            def part(tree, name):
                i = index[name]
                return jax.tree.map(lambda a: a[i * b:(i + 1) * b], tree)

            out_fake = part(outs_all, "adv")
            g_adv, per_scale = losses.lsgan_g_loss(out_fake)
            for i, v in enumerate(per_scale):
                aux[f"G_loss_adv_fake_{i}"] = v
            aux["G_loss_adv_fake"] = g_adv
            total = g_adv

            feats_real = part(feats_all, "real") if "real" in index else None

            def recon_losses(sig, feats_name, prefix):
                loss = 0.0
                if t.lambda_feat > 0:
                    feats = part(feats_all, feats_name)
                    fl = losses.multiscale_feat_loss(feats, feats_real)
                    aux[f"G_loss_{prefix}_feat"] = fl
                    loss += t.lambda_feat * fl
                if t.lambda_spec > 0:
                    sl = losses.multiscale_spec_loss(
                        sig[..., 0], real_j[..., 0], fft_sizes, sr
                    )
                    aux[f"G_loss_{prefix}_spec"] = sl
                    loss += t.lambda_spec * sl
                if t.lambda_wave > 0:
                    wl = losses.wave_l1_loss(sig[..., 0], signal)
                    aux[f"G_loss_{prefix}_wave"] = wl
                    loss += t.lambda_wave * wl
                return loss

            g_rec = 0.0
            if use_rec:
                g_rec = recon_losses(rec, "rec", "rec")
            aux["G_loss_rec"] = g_rec
            total += t.lambda_rec * g_rec

            g_idt = 0.0
            if use_idt:
                # in the no_conv case the idt D-part equals the adv part
                # (label_tgt == label_src there), so its feats are reused
                g_idt = recon_losses(idt, "idt" if "idt" in index else "adv", "idt")
            aux["G_loss_idt"] = g_idt
            total += t.lambda_idt * g_idt

            g_cont = 0.0
            if t.lambda_cont_emb > 0:
                # The rec pass above already encoded stop_gradient(fake) —
                # its content output IS the 'converted' embedding (same
                # params, same input, same f32 finalization; gradients to
                # the encoder flow through the shared apply identically), so
                # reuse it instead of re-encoding inside the batched
                # encode-only call. cfg.train.reuse_rec_emb=False (or the
                # TDVC_REUSE_REC_EMB=0 override) restores the re-encode
                # for A/B.
                reuse_rec_emb = (
                    cont_rec is not None
                    and perf.enabled("reuse_rec_emb", pflags)
                )
                enc_in = []
                if t.lambda_corrupted and "corrupted" in batch:
                    enc_in.append(batch["corrupted"][..., None])
                if t.lambda_converted and not reuse_rec_emb:
                    enc_in.append(jax.lax.stop_gradient(fake))
                embs = (
                    G_k.apply(pgk, jnp.concatenate(enc_in, 0), None, encode_only=True)
                    if enc_in
                    else None
                )
                i_enc = 0
                if t.lambda_corrupted and "corrupted" in batch:
                    emb_corr = embs[i_enc * b:(i_enc + 1) * b]
                    i_enc += 1
                    g_cont += t.lambda_corrupted * losses.contrastive_loss(
                        cont, emb_corr, k_cont1, num_negatives=100, temp=0.1
                    )
                if t.lambda_converted:
                    emb_conv = (
                        cont_rec if reuse_rec_emb
                        else embs[i_enc * b:(i_enc + 1) * b]
                    )
                    g_cont += t.lambda_converted * losses.contrastive_loss(
                        cont, emb_conv, k_cont2, num_negatives=100, temp=0.1
                    )
            aux["G_loss_cont_emb"] = g_cont
            total += t.lambda_cont_emb * g_cont

            g_lat = 0.0
            if use_c and t.lambda_latcls != 0:
                logits = C.apply(params_c, cont)
                g_lat = losses.cross_entropy_loss(logits, label_src)
            aux["G_loss_lat_cls"] = g_lat
            total += t.lambda_latcls * g_lat

            g_f0 = 0.0
            if t.lambda_f0 != 0:
                _, act_conv = crepe_mod.filtered_pitch(state.crepe_params, fake[..., 0])
                g_f0 = jnp.mean((act_conv - jax.lax.stop_gradient(act_conv_tgt)) ** 2)
            aux["g_loss_f0"] = g_f0
            total += t.lambda_f0 * g_f0

            aux["G_loss"] = total
            return total, aux

        def g_update(pg, og):
            (_, g_aux), grads = jax.value_and_grad(
                g_loss_fn, argnums=(0, 1, 2, 3), has_aux=True
            )(pgk0, gout0, gsubs0, gcont0)
            gpk, g_out, g_subs, g_cont = grads
            (gpk_fake_path,) = g_fake_vjp((g_out, g_subs, g_cont))
            gpk_total = jax.tree.map(jnp.add, gpk, gpk_fake_path)
            # chain kernel-space grads back to the (v, g) master params
            (g_grads,) = g_kern_vjp(gpk_total)
            updates, og_new = g_opt.update(g_grads, og, pg)
            return optax.apply_updates(pg, updates), og_new, _f32_metrics(g_aux)

        def g_noop(pg, og):
            return pg, og, _zero_metrics_like(
                lambda a, b, c, d: g_loss_fn(a, b, c, d)[1],
                pgk0, gout0, gsubs0, gcont0,
            )

        params_g, opt_g, g_metrics = _maybe_interval(
            state.step, t.G_step_interval, g_update, g_noop, state.params_g, state.opt_g
        )
        metrics.update(g_metrics)

        new_state = TrainState(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            params_c=params_c,
            opt_g=opt_g,
            opt_d=opt_d,
            opt_c=opt_c,
            crepe_params=state.crepe_params,
        )
        return new_state, metrics

    return train_step


def build_eval_step(cfg: Config, G, D, C, mesh=None) -> Callable:
    """Validation metrics for one batch (train.py:524-594): adversarial
    LSGAN numbers on real/fake plus latent-classifier loss/accuracy.

    Binds the config's perf flags and the SPMD mesh scope at trace time
    exactly like build_train_step (ADVICE r4 #1): validation previously
    traced with base-default PerfFlags regardless of cfg.train.*, and DP
    validation hit the GSPMD grouped-conv batch replication the train step
    avoids via shard_map.
    """
    from td_vc_gan_tpu import perf
    from td_vc_gan_tpu.models.layers import compute_dtype_scope, spmd_mesh_scope

    t = cfg.train
    use_c = C is not None
    num_classes = G.num_classes
    sr = cfg.model.sample_rate
    pflags = perf.from_config(cfg)
    compute_dtype = getattr(t, "compute_dtype", None)

    def eval_step(state: TrainState, batch, rng):
        with perf.flags_scope(pflags), spmd_mesh_scope(mesh), \
                compute_dtype_scope(compute_dtype):
            return _eval_step_body(state, batch, rng)

    def _eval_step_body(state: TrainState, batch, rng):
        signal = batch["signal"]
        label_src = batch["label"]
        x = signal[..., None]
        k_tgt, k_exc = jax.random.split(rng)

        if t.no_conv:
            label_tgt = label_src
        else:
            label_tgt = jax.random.randint(k_tgt, label_src.shape, 0, num_classes)
        c_tgt = jax.nn.one_hot(label_tgt, num_classes)

        f0_src, _ = crepe_mod.filtered_pitch(state.crepe_params, signal)
        exc = dsp.f0_to_excitation(f0_src, 64, k_exc, sr)[..., None]

        fake, _, cont = G.apply(state.params_g, x, c_tgt, None, exc)
        out_real, _ = D.apply(state.params_d, x, label_src, ())
        out_fake, _ = D.apply(state.params_d, fake, label_tgt, ())
        l_real, l_fake, _, _ = losses.lsgan_d_loss(out_real, out_fake)
        g_adv, _ = losses.lsgan_g_loss(out_fake)

        m = {
            "val_loss_adv_real": l_real,
            "val_loss_adv_fake": l_fake,
            "val_D_loss": l_real + l_fake,
            "val_G_loss": g_adv,
        }
        if use_c:
            logits = C.apply(state.params_c, cont)
            m["val_loss_lat_cls"] = losses.cross_entropy_loss(logits, label_src)
            m["val_C_acc"] = jnp.mean(jnp.argmax(logits, -1) == label_src)
        return m

    return eval_step
