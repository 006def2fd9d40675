"""Measured speculative decoding with a TRAINED draft/verifier pair.

`tools/spec_ab.py` measures the component costs and the full-acceptance
bound (draft == verifier); this tool closes the remaining gap between
*projected* and *measured* speedup: it mints a real model pair by
overfitting the verifier on a synthetic corpus (the zero-egress stand-in
for a released checkpoint) and DISTILLING the draft from the verifier's
own greedy rollout (r5b — the real-world protocol, and the one whose
teacher-forced accuracy is the acceptance rate's actual upper bound),
snapshots the draft at several accuracy levels, and measures — per
snapshot —
the actual per-token acceptance rate and the end-to-end wall-clock
speedup of `SpeculativeDecodingTask` over plain greedy on the same
batch, same session. Outputs are also checked token-identical (the
speculative guarantee) at every acceptance level.

Snapshot policy (round-5 fix): the r4 run snapshotted the draft when
teacher-forced accuracy crossed fixed thresholds, checked every 10 steps —
and the overfit jumped 0.45->0.94 inside one window, collapsing every
threshold onto the same params (speedup table degenerated to one point).
Accuracy-threshold gating cannot survive a one-step jump no matter the
cadence, so the draft now snapshots by STEP COUNT: the first step where
accuracy clears a floor (0.2), then geometrically spaced steps after it,
then the final converged params. Each snapshot's measured teacher-forced
accuracy is reported in its row, so the acceptance curve is parameterized
by what the draft actually is, not by what a threshold hoped it would be.
A non-degeneracy warning fires if every row still lands on one acceptance
value.

Usage: python tools/spec_train_ab.py [verifier] [draft] [n_utts] [max_steps]
                                     [max_words]
       # defaults: tiny debug 12 600 44 (CPU-runnable);
       # the flagship measurement: small tiny / medium tiny on-chip.
       # max_words sets the target-length range (6..max_words words,
       # bounds inclusive; values <= 6 are clamped to 7) — short targets
       # hide the decode-loop effect behind the shared prefill cost;
       # ~40+ makes the token loop dominate, which is the regime
       # speculation exists for.

Flagship verifier (r5): a `large*` verifier auto-switches its trainer to
frozen-random-encoder + Adafactor + bf16 frozen masters (the TransKD
flagship recipe's memory levers) — fp32 Adam state alone (~18 GB) OOMs a
16 GB chip, but the decoder-only overfit fits AND is the honest regime
anyway: the verifier only needs structured rollouts keyed on its (fixed)
audio features, and the flagship question is whether speculation pays
when the VERIFIER's step is weight-stream-bound (~3 GB bf16/step at
large-v2) while the draft's is dispatch-floor-bound.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORDS = ("the quick brown fox jumps over a lazy dog while rain falls on "
         "green hills and boats cross the wide river before dawn light "
         "touches every tall tower in the old town square").split()


def build_corpus(tokenizer, n_utts, rng, max_words=14):
    """n seeded (wave, dec_input_ids, labels) with real-text targets."""
    sot = list(tokenizer.sot_sequence_including_notimestamps)
    rows = []
    for _ in range(n_utts):
        wave = (rng.standard_normal(16000 * int(rng.integers(3, 9)))
                .astype(np.float32) * 0.08)
        n_words = int(rng.integers(6, max(max_words, 7) + 1))  # inclusive
        text = " " + " ".join(rng.choice(WORDS) for _ in range(n_words))
        toks = tokenizer.encode(text)
        dec = sot + toks
        lab = dec[1:] + [tokenizer.eot]
        rows.append((wave, dec, lab))
    return rows


def batchify(rows, eot):
    L = max(len(d) for _, d, _ in rows)
    dec = np.full((len(rows), L), eot, np.int32)
    lab = np.full((len(rows), L), -100, np.int32)
    for i, (_, d, l) in enumerate(rows):
        dec[i, : len(d)] = d
        lab[i, : len(l)] = l
    return dec, lab


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import (
        Whisper,
        decoder_apply,
        encoder_apply,
        init_params,
    )
    from whisper_flamingo_tpu.speculative import SpeculativeDecodingTask
    from whisper_flamingo_tpu.tokenizer import get_tokenizer
    from whisper_flamingo_tpu.training.optim import (
        encoder_frozen_mask,
        whisper_optimizer,
    )
    from whisper_flamingo_tpu.training.steps import (
        TrainState,
        cast_frozen_bf16,
        make_ce_train_step,
    )

    import optax

    v_name = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    d_name = sys.argv[2] if len(sys.argv) > 2 else "debug"
    n_utts = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    max_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 600
    max_words = int(sys.argv[5]) if len(sys.argv) > 5 else 44
    mode = sys.argv[6] if len(sys.argv) > 6 else "auto"  # auto|flagship|full
    K = 4

    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    rng = np.random.default_rng(0)
    rows = build_corpus(tokenizer, n_utts, rng, max_words)
    dims_v, dims_d = MODEL_DIMS[v_name], MODEL_DIMS[d_name]
    mels = log_mel_spectrogram(
        np.stack([np.asarray(pad_or_trim(w, N_SAMPLES)) for w, _, _ in rows]),
        n_mels=dims_v.n_mels,
    )
    dec, lab = batchify(rows, tokenizer.eot)
    batch = {"input_ids": np.asarray(mels), "dec_input_ids": dec, "labels": lab}
    audio_s = n_utts * 30.0
    max_txt = dec.shape[1]

    # bf16 training: at `small`+ scale the fp32 path materializes the
    # (B, H, 1500, 1500) encoder attention logits in f32 and OOMs a
    # 16 GB chip; bf16 engages the flash64 kernel (the production
    # mixed-precision recipe path) and overfits these tiny corpora fine
    on_tpu = jax.default_backend() != "cpu"
    train_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def accuracy_fn(dims):
        @jax.jit
        def acc(params, mel, dec, lab):
            feats = encoder_apply(params, dims, mel, dtype=train_dtype)
            logits, _ = decoder_apply(params, dims, dec, feats, dtype=train_dtype)
            hit = (jnp.argmax(logits, -1) == lab) & (lab != -100)
            return jnp.sum(hit) / jnp.sum(lab != -100)

        return acc

    def make_trainer(name, dims, flagship=False):
        # init under ONE jit program: eager init_params dispatches one
        # ~44 ms tunnel round trip per tensor — ~15 min for large-v2's
        # hundreds of params (measured, r5); jitted it is one dispatch
        key = jax.random.PRNGKey(hash(name) % 2**31)
        if flagship:
            # large* verifier: decoder-only overfit with Adafactor +
            # bf16 frozen encoder masters (the TransKD flagship memory
            # levers — fp32 Adam state alone OOMs the 16 GB chip)
            @jax.jit
            def _init(k):
                p = init_params(k, dims)
                return cast_frozen_bf16(p, encoder_frozen_mask(p))

            params = _init(key)
            jax.block_until_ready(params)
            mask = encoder_frozen_mask(params)
            tx, _ = whisper_optimizer(
                params, 5e-4, warmup_steps=50, total_steps=max_steps,
                trainable_mask=mask, max_grad_norm=1.0,
                optimizer="adafactor",
            )
            step = make_ce_train_step(
                dims, tx, freeze_encoder=True, use_xt=False,
                dtype=train_dtype, remat=on_tpu, donate=on_tpu,
            )
            return TrainState.create(params, tx), step, accuracy_fn(dims)
        params = jax.jit(lambda k: init_params(k, dims))(key)
        jax.block_until_ready(params)
        # warmup + clipping: bare adamw(1e-3) NaNs within 20 steps on a
        # random-init `small` in bf16 on-chip (this is an overfit
        # harness, not the FT recipe — stability over parity here)
        lr = optax.linear_schedule(0.0, 5e-4, 50)
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(lr, weight_decay=0.0),
        )
        # remat + donation: without them the small-sized fwd residuals
        # (~all-layer (B, 1500, d) + MLP hiddens) plus a second live
        # optimizer state OOM the 16 GB chip at b12
        step = make_ce_train_step(
            dims, tx, freeze_encoder=False, use_xt=False,
            dtype=train_dtype, remat=on_tpu, donate=on_tpu,
        )
        return TrainState.create(params, tx), step, accuracy_fn(dims)

    def train_verifier(name, dims, threshold, flagship=False, batch=None):
        """Overfit until teacher-forced accuracy >= threshold."""
        state, step, acc_fn = make_trainer(name, dims, flagship=flagship)
        t0 = time.perf_counter()
        for i in range(max_steps):
            state, metrics = step(state, batch)
            if (i + 1) % 10 == 0 or i == max_steps - 1:
                a = float(acc_fn(state.params, batch["input_ids"],
                                 batch["dec_input_ids"], batch["labels"]))
                print(f"  {name} step {i+1}: loss={float(metrics['loss']):.3f} "
                      f"teacher-forced acc={a:.3f}", flush=True)
                if a >= threshold:
                    print(f"  {name} trained in {time.perf_counter() - t0:.0f}s")
                    return jax.device_get(state.params)
        raise SystemExit(f"{name} failed to reach acc {threshold} "
                         f"(raise max_steps)")

    def train_draft_snapshots(name, dims, top_acc, batch=None):
        """Overfit, snapshotting by STEP COUNT (see module docstring):
        the first step whose accuracy clears 0.2 anchors a geometric
        step ladder (s0, s0+4, s0+10, s0+25, s0+60, ...) so intermediate
        drafts exist even when accuracy jumps 0.45->0.94 in one step;
        stops once accuracy reaches ``top_acc``. Returns
        [(measured_acc, step, params_on_host)] sorted by acc, deduped to
        rows that differ by >= 0.02 acc."""
        state, step, acc_fn = make_trainer(name, dims)
        snaps = []  # (acc, step, host_params)
        anchor = None
        ladder = (0, 4, 10, 25, 60, 140, 300)
        t0 = time.perf_counter()
        for i in range(max_steps):
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])
            # accuracy every step once the anchor is set (or the loss has
            # left the random-init plateau) — the draft is the small model
            # of the pair, one fwd is cheap, and a sparse cadence here is
            # exactly what collapsed the r4 curve
            check = (anchor is not None or loss < 8.0
                     or (i + 1) % 10 == 0 or i == max_steps - 1)
            if not check:
                continue
            a = float(acc_fn(state.params, batch["input_ids"],
                             batch["dec_input_ids"], batch["labels"]))
            if anchor is None and a >= 0.2:
                anchor = i
            take = (i == max_steps - 1 or a >= top_acc
                    or (anchor is not None and (i - anchor) in ladder))
            if take:
                print(f"  {name} step {i+1}: loss={loss:.3f} "
                      f"teacher-forced acc={a:.3f}  [snapshot]", flush=True)
                snaps.append((a, i + 1, jax.device_get(state.params)))
                if a >= top_acc:
                    break
            elif (i + 1) % 10 == 0:
                print(f"  {name} step {i+1}: loss={loss:.3f} "
                      f"teacher-forced acc={a:.3f}", flush=True)
        print(f"  {name} trained in {time.perf_counter() - t0:.0f}s, "
              f"{len(snaps)} raw snapshots")
        snaps.sort(key=lambda s: s[0])
        kept, last_acc = [], -1.0
        for a, s, p in snaps:
            if a - last_acc >= 0.02 or (a, s, p) is snaps[-1]:
                kept.append((a, s, p))
                last_acc = a
        return kept

    print(f"corpus: {n_utts} utts, verifier={v_name}, draft={d_name}, K={K}")
    # the verifier's absolute teacher-forced accuracy doesn't gate the
    # measurement (its own greedy rollout IS the reference tokens) — it
    # only needs to produce structured text, so 0.95 is plenty; the
    # draft's levels trace the acceptance curve
    V_ACC, D_TOP = 0.95, 0.98
    flagship = (v_name.startswith("large") if mode == "auto"
                else mode == "flagship")
    v_host = train_verifier("verifier", dims_v, V_ACC, flagship=flagship,
                            batch=batch)

    # snapshots were device_get (host numpy) so training could donate —
    # push them back as DEVICE arrays before timing: numpy params would
    # re-transfer the full fp32 tree through the tunnel on EVERY
    # task.run (~20 s/run for `small` at ~30 MB/s), drowning the
    # measurement in transfer time on both sides of the ratio.
    # Stored bf16: the decode path casts weights to bf16 at use, so bf16
    # masters are numerically identical and halve resident HBM — at
    # large-v2 b8 the fp32 masters (6.2 GB) + bf16 cast + x-attn slabs
    # would not co-reside
    v_params = jax.device_put(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                     if jnp.issubdtype(x.dtype, jnp.floating) else x,
                     v_host)
    )
    jax.block_until_ready(v_params)
    verifier = Whisper(dims=dims_v, params=v_params, dtype=jnp.bfloat16)
    opts = DecodingOptions(language="en", without_timestamps=True,
                           fp16=True, sample_len=max_txt + 8)

    def timed(task, mel, iters=5):
        task.run(mel)  # compile + warm
        best, out = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = task.run(mel)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, out

    greedy = DecodingTask(verifier, opts)
    t_g, base = timed(greedy, mels)
    base_toks = [r.tokens for r in base]
    n_tok = sum(len(t) + 1 for t in base_toks)
    print(f"\ngreedy {v_name}: {t_g:.3f}s/batch  {audio_s / t_g:.0f}x RT "
          f"({n_tok} tokens)")

    # DISTILL the draft from the verifier's own greedy rollout, not the
    # corpus labels (r5b fix): acceptance is P(draft next token ==
    # verifier next token | verifier prefix), so the draft's training
    # targets must be the verifier's trajectory. Training on the corpus
    # only works when the verifier's rollout reproduces the corpus —
    # true for the fully-overfit small/medium verifiers, false for the
    # frozen-encoder flagship one, whose free-running rollout drifts
    # from labels its teacher-forced accuracy still scores 0.95+ on
    # (measured: corpus-trained draft at 0.973 teacher-forced acc got
    # 0.05 acceptance). This is also the real-world protocol: released
    # draft models are distilled from the verifier, not the data.
    sot = list(tokenizer.sot_sequence_including_notimestamps)
    distill_rows = []
    for (w, _, _), t in zip(rows, base_toks):
        dec_r = sot + list(t)
        distill_rows.append((w, dec_r, dec_r[1:] + [tokenizer.eot]))
    d_dec, d_lab = batchify(distill_rows, tokenizer.eot)
    d_batch = {"input_ids": np.asarray(mels), "dec_input_ids": d_dec,
               "labels": d_lab}
    d_snaps = train_draft_snapshots("draft", dims_d, D_TOP, batch=d_batch)

    print(f"{'draft acc':>10} {'step':>6} {'accept/tok':>10} {'tok/round':>10} "
          f"{'wall':>8} {'xRT':>8} {'speedup':>8} match")
    acc_rates = []
    for level, at_step, host_params in d_snaps:
        d_params = jax.device_put(host_params)
        jax.block_until_ready(d_params)
        draft = Whisper(dims=dims_d, params=d_params, dtype=jnp.bfloat16)
        task = SpeculativeDecodingTask(verifier, draft, opts, draft_len=K)
        t_s, out = timed(task, mels)
        stats = {k: float(v) for k, v in task.last_stats.items()}
        rounds = max(stats["rounds"], 1.0)
        tok_round = stats["accepted_tokens"] / (rounds * n_utts)
        # accepted_tokens counts (prefix + bonus) per row per round;
        # drafted per row per round is K
        acc_rate = max(0.0, (stats["accepted_tokens"] / n_utts - rounds)
                       / (rounds * K))
        acc_rates.append(acc_rate)
        match = all(r.tokens == b for r, b in zip(out, base_toks))
        print(f"{level:>10.3f} {at_step:>6d} {acc_rate:>10.2f} "
              f"{tok_round:>10.2f} {t_s:>7.3f}s {audio_s / t_s:>7.0f}x "
              f"{t_g / t_s:>7.2f}x {match}", flush=True)
        if not match:
            raise SystemExit("speculative output diverged from greedy!")
    if len(acc_rates) >= 2 and max(acc_rates) - min(acc_rates) < 0.05:
        print("WARNING: acceptance spread < 0.05 across snapshots — the "
              "curve is degenerate; raise max_steps / n_utts or use a "
              "harder corpus", flush=True)


if __name__ == "__main__":
    main()
