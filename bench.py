"""Headline benchmark: Whisper ``small`` decode + train-step on one TPU chip.

Measures, as compiled XLA programs on batched 30 s segments:

- greedy decode RTF (real-time factor: seconds of audio per wall second)
  — the round-over-round continuity metric — plus its int8 serving-mode
  variant (DecodingOptions(quantize="int8"), docs/performance.md);
- beam-15 decode RTF — the reference's published eval protocol
  (`/root/reference/README.md:113-117`, beam 15 for reported results);
- teacher-forced train-step time and MFU for the LibriSpeech FT recipe
  shape (batch 8, `config/audio/librispeech.yaml`).

Honesty guard: EOT is suppressed during the decode benches so the
incremental loop must consume the full ``sample_len`` token budget —
an early-EOT exit under random-init weights cannot inflate RTF — and the
result token counts are asserted. Timing relies on ``task.run``'s
device->host fetch per iteration for synchronization (the axon tunnel's
``block_until_ready`` is unreliable; see CLAUDE.md).

Prints ONE JSON line; the headline metric keys are joined by extra
fields (beam15_*, train_*) in the same object.

Env overrides (used by tests): WF_BENCH_MODEL, WF_BENCH_ITERS,
WF_BENCH_PLATFORM.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _decode_bench(model, mel, sample_len, beam_size, iters, eot, quantize=None,
                  xt=None):
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask

    task = DecodingTask(
        model,
        DecodingOptions(
            language="en",
            without_timestamps=True,
            sample_len=sample_len,
            fp16=True,
            beam_size=beam_size,
            quantize=quantize,
            # suppress EOT: the loop must run the full sample_len budget
            suppress_tokens=f"-1,{eot}",
        ),
    )
    results = task.run(mel, xt=xt)  # warmup (compile)
    for r in results:
        assert len(r.tokens) >= sample_len, (
            f"decode consumed only {len(r.tokens)}/{sample_len} tokens; "
            "RTF would be inflated"
        )
    t0 = time.perf_counter()
    for _ in range(iters):
        results = task.run(mel, xt=xt)  # device_get inside run syncs each iter
    elapsed = time.perf_counter() - t0
    for r in results:
        assert len(r.tokens) >= sample_len
    batch = mel.shape[0]
    rtf = iters * batch * 30.0 / elapsed
    tok_s = iters * batch * sample_len / elapsed
    return rtf, tok_s


def _flamingo_model(dims, bert_dim=768):
    """Gated-x-attn (Whisper-Flamingo) model at ``dims`` with opened gates.

    The framework's namesake configuration: decoder blocks carry one
    conditioning stream of gated cross-attention (reference
    model.py:110-215). Gates init at 0 (identity); the bench opens them to
    1 so the xt stream genuinely flows through every decode step — XLA
    cannot fold the conditioning path away. Params are kept as bf16
    masters: the decode program computes in bf16 anyway, and the flagship
    (large-v2 + 32x gated blocks, ~2.2B params) must co-reside with the
    beam KV slabs on one 16 GB chip.
    """
    import jax
    import jax.numpy as jnp

    from whisper_flamingo_tpu.models.whisper import (
        ModelExtras, Whisper, init_params,
    )

    extras = ModelExtras(add_gated_x_attn=1, num_langs=1, bert_dim=bert_dim)
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            init_params(k, dims, extras),
        )
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    g = params["decoder"]["blocks"]["gated"]
    g["langs"]["attn_gate"] = jnp.ones_like(g["langs"]["attn_gate"])
    g["ff_gate"] = jnp.ones_like(g["ff_gate"])
    return Whisper(dims=dims, params=params, extras=extras, dtype=jnp.bfloat16)


def _train_bench(dims, params, iters):
    import jax
    import jax.numpy as jnp

    from whisper_flamingo_tpu.profiling import mfu, model_flops
    from whisper_flamingo_tpu.training.optim import whisper_optimizer
    from whisper_flamingo_tpu.training.steps import TrainState, make_ce_train_step

    rng = np.random.default_rng(0)
    batch_size, text_len = 8, 128
    tx, _ = whisper_optimizer(params, 1e-5, total_steps=1000)
    step = make_ce_train_step(dims, tx, dtype=jnp.bfloat16, donate=False)
    batch = {
        "input_ids": jnp.asarray(
            rng.standard_normal((batch_size, 80, 3000)), jnp.float32
        ),
        "dec_input_ids": jnp.asarray(
            rng.integers(0, 1000, (batch_size, text_len)), jnp.int32
        ),
        "labels": jnp.asarray(
            rng.integers(0, 1000, (batch_size, text_len)), jnp.int32
        ),
    }
    state = TrainState.create(params, tx)
    state, m = step(state, batch)
    _ = float(m["loss"])  # sync warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    _ = float(m["loss"])  # host fetch forces completion of the chain
    dt = (time.perf_counter() - t0) / iters
    # fwd + bwd ~= 3x forward FLOPs
    flops = 3 * model_flops(dims, batch_size, mel_frames=3000, text_len=text_len)
    return dt * 1000, mfu(flops / dt, "v5e")


_RESULT: dict = {}  # filled progressively; emitted once
_EMITTED = False


def _emit() -> None:
    """Print the (possibly partial) result line exactly once. A driver
    timeout mid-flagship (cold remote compiles are 1-5 min each) sends
    SIGTERM; the headline numbers measured so far must not be lost."""
    global _EMITTED
    if _EMITTED or "value" not in _RESULT:
        return
    _EMITTED = True
    print(json.dumps(_RESULT), flush=True)


def _on_signal(sig, frame):
    _RESULT["bench_interrupted"] = f"signal {sig}"
    _emit()
    sys.exit(1)


def main() -> None:
    import signal

    import jax
    import jax.numpy as jnp

    for _sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(_sig, _on_signal)

    platform = os.environ.get("WF_BENCH_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    # persistent compilation cache: keeps repeat bench runs out of the
    # (slow, remote) compile path. CPU smoke runs get a host-salted dir:
    # XLA:CPU caches AOT machine code keyed without the full feature
    # flags, and loading an executable compiled on a different
    # microarchitecture can SIGILL (see tests/conftest.py).
    try:
        cache_dir = "/tmp/wf_tpu_jax_cache"
        if platform == "cpu":
            import hashlib

            try:
                with open("/proc/cpuinfo") as f:
                    feats = next(
                        (ln for ln in f if ln.startswith("flags")), ""
                    )
            except OSError:
                feats = ""
            salt = hashlib.sha256(feats.encode()).hexdigest()[:10]
            cache_dir = f"/tmp/wf_cpu_jax_cache_{salt}"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # backend-init watchdog: the axon tunnel can wedge (backend init then
    # blocks forever in a retry sleep — CLAUDE.md). Emit a diagnostic
    # line and exit instead of hanging until the driver gives up with no
    # artifact at all. Generous default: a healthy cold init is seconds.
    import threading

    init_ok = threading.Event()
    init_timeout = float(os.environ.get("WF_BENCH_INIT_TIMEOUT_S", "600"))

    def _init_watchdog():
        if not init_ok.wait(init_timeout):
            print(
                json.dumps({
                    "metric": "bench_error",
                    "value": 0.0,
                    "unit": "none",
                    "error": f"device backend init exceeded {init_timeout:.0f}s "
                             "(TPU tunnel unreachable?)",
                    # the tunnel wedges for hours at a time (CLAUDE.md);
                    # the most recent completed full-bench transcript is
                    # archived in-tree so a wedge at driver time doesn't
                    # erase the round's measured rows.
                    "archived_run": "docs/measurements/r5/bench.log",
                }),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=_init_watchdog, daemon=True).start()
    _ = float(np.asarray(jax.numpy.ones(()) + 1))  # forces backend init
    init_ok.set()

    from whisper_flamingo_tpu.audio import log_mel_spectrogram
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = os.environ.get("WF_BENCH_MODEL", "small")
    iters = int(os.environ.get("WF_BENCH_ITERS", "12"))
    batch = 8
    sample_len = 64

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, 480_000)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(audio)

    greedy_rtf, greedy_tok_s = _decode_bench(model, mel, sample_len, None, iters, eot)
    print(f"greedy: rtf={greedy_rtf:.1f} tok/s={greedy_tok_s:.0f}", file=sys.stderr)
    _RESULT.update({
        "metric": f"greedy_decode_rtf_{model_name}_b{batch}",
        "value": round(greedy_rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(greedy_rtf / 5.0, 3),
        "greedy_tokens_per_sec": round(greedy_tok_s, 1),
        "decode_budget_guard": f"full {sample_len} tokens/segment (EOT suppressed)",
    })
    # int8 serving mode (DecodingOptions(quantize="int8")): same program
    # shape, loop-resident operands stored int8 (see docs/performance.md).
    # Guarded: an int8-path failure must not lose the headline metric.
    try:
        int8_rtf, _ = _decode_bench(model, mel, sample_len, None, iters, eot, "int8")
        print(f"greedy int8: rtf={int8_rtf:.1f}", file=sys.stderr)
    except Exception as e:
        int8_rtf = 0.0
        print(f"int8 bench failed: {e}", file=sys.stderr)
    _RESULT[f"greedy_int8_rtf_{model_name}_b{batch}"] = round(int8_rtf, 3)
    beam_rtf, beam_tok_s = _decode_bench(
        model, mel, sample_len, 15, max(iters // 3, 1), eot
    )
    print(f"beam15: rtf={beam_rtf:.1f} tok/s={beam_tok_s:.0f}", file=sys.stderr)
    _RESULT[f"beam15_decode_rtf_{model_name}_b{batch}"] = round(beam_rtf, 3)
    _RESULT["beam15_tokens_per_sec"] = round(beam_tok_s, 1)
    # int8kv beam serving mode (int8 weights/slabs + int8 self cache with
    # per-token scales): the beam step is bytes-bound on the self-cache
    # reads + physical beam reorder, so this is the beam-path int8 lever
    # (docs/performance.md). Guarded like the greedy int8 leg.
    try:
        beam_kv_rtf, _ = _decode_bench(
            model, mel, sample_len, 15, max(iters // 3, 1), eot, "int8kv"
        )
        print(f"beam15 int8kv: rtf={beam_kv_rtf:.1f}", file=sys.stderr)
    except Exception as e:
        beam_kv_rtf = 0.0
        print(f"int8kv beam bench failed: {e}", file=sys.stderr)
    _RESULT[f"beam15_int8kv_rtf_{model_name}_b{batch}"] = round(beam_kv_rtf, 3)
    train_ms, train_mfu = _train_bench(dims, params, max(iters // 2, 2))
    print(f"train: {train_ms:.1f} ms/step mfu={train_mfu:.3f}", file=sys.stderr)
    _RESULT[f"train_step_ms_{model_name}_b{batch}"] = round(train_ms, 2)
    _RESULT["train_mfu_v5e"] = round(train_mfu, 4)

    # Whisper-Flamingo (gated-x-attn) decode — the model the framework is
    # named after, on the reference's published protocol (beam 15,
    # README.md:113-117; gated blocks model.py:110-215). Conditioning:
    # a BERT-dim (768) translated-text stream, S=64 tokens (Trans-ASR),
    # plus one AV-shaped row (AV-HuBERT-large embed dim 1024, S=448 video
    # frames @25 fps = 17.9 s — the max conditioning length: the xt
    # stream takes the decoder positional embedding, so n_text_ctx=448
    # caps it, here exactly as in the reference, model.py:322).
    # Guarded: a flamingo-path failure must not lose the plain rows.
    try:
        fmodel = _flamingo_model(dims, bert_dim=768)
        xt = jnp.asarray(
            rng.standard_normal((1, batch, 64, 768)), jnp.float32
        )
        fl_rtf, _ = _decode_bench(
            fmodel, mel, sample_len, 15, max(iters // 3, 1), eot, xt=xt
        )
        print(f"flamingo beam15: rtf={fl_rtf:.1f}", file=sys.stderr)
        _RESULT[f"flamingo_beam15_rtf_{model_name}"] = round(fl_rtf, 3)
        try:
            fl_kv_rtf, _ = _decode_bench(
                fmodel, mel, sample_len, 15, max(iters // 3, 1), eot,
                "int8kv", xt=xt,
            )
        except Exception as e:
            fl_kv_rtf = 0.0
            print(f"flamingo int8kv bench failed: {e}", file=sys.stderr)
        print(f"flamingo beam15 int8kv: rtf={fl_kv_rtf:.1f}", file=sys.stderr)
        _RESULT[f"flamingo_beam15_int8kv_rtf_{model_name}"] = round(fl_kv_rtf, 3)
        del fmodel
        favmodel = _flamingo_model(dims, bert_dim=1024)
        xt_av = jnp.asarray(
            rng.standard_normal((1, batch, 448, 1024)), jnp.float32
        )
        fav_rtf, _ = _decode_bench(
            favmodel, mel, sample_len, 15, max(iters // 3, 1), eot, xt=xt_av
        )
        print(f"flamingo AV beam15: rtf={fav_rtf:.1f}", file=sys.stderr)
        _RESULT[f"flamingo_av_beam15_rtf_{model_name}"] = round(fav_rtf, 3)
        del favmodel
    except Exception as e:
        _RESULT["flamingo_error"] = f"{type(e).__name__}: {e}"
        print(f"flamingo bench failed: {e}", file=sys.stderr)

    # flagship: the reference's published protocol on its published model
    # size — large-v2 greedy AND beam-15 (README.md:96-101,113-117), with
    # the same full-token-budget guard, in the driver-verified artifact
    # (VERDICT r2 #2). Same-chip sequential run after freeing the small
    # model's buffers.

    flagship_name = os.environ.get("WF_BENCH_FLAGSHIP", "large-v2")
    if flagship_name:
        del model, params
        try:
            ldims = MODEL_DIMS[flagship_name]
            lparams = jax.jit(lambda k: init_params(k, ldims))(jax.random.PRNGKey(0))
            jax.block_until_ready(lparams)
            lmodel = Whisper(dims=ldims, params=lparams, dtype=jnp.bfloat16)
            key = flagship_name.replace("-", "_").replace(".", "_")
            lg_rtf, _ = _decode_bench(
                lmodel, mel, sample_len, None, max(iters // 3, 2), eot
            )
            print(f"{flagship_name} greedy: rtf={lg_rtf:.1f}", file=sys.stderr)
            _RESULT[f"{key}_greedy_rtf_b{batch}"] = round(lg_rtf, 3)
            try:
                li_rtf, _ = _decode_bench(
                    lmodel, mel, sample_len, None, max(iters // 3, 2), eot, "int8"
                )
            except Exception as e:  # keep the bf16 flagship numbers
                li_rtf = 0.0
                print(f"flagship int8 bench failed: {e}", file=sys.stderr)
            print(f"{flagship_name} greedy int8: rtf={li_rtf:.1f}", file=sys.stderr)
            _RESULT[f"{key}_greedy_int8_rtf_b{batch}"] = round(li_rtf, 3)
            lb_rtf, _ = _decode_bench(lmodel, mel, sample_len, 15, 2, eot)
            print(f"{flagship_name} beam15: rtf={lb_rtf:.1f}", file=sys.stderr)
            _RESULT[f"{key}_beam15_rtf_b{batch}"] = round(lb_rtf, 3)
            try:
                lbkv_rtf, _ = _decode_bench(
                    lmodel, mel, sample_len, 15, 2, eot, "int8kv"
                )
            except Exception as e:
                lbkv_rtf = 0.0
                print(f"flagship int8kv beam bench failed: {e}", file=sys.stderr)
            print(
                f"{flagship_name} beam15 int8kv: rtf={lbkv_rtf:.1f}",
                file=sys.stderr,
            )
            _RESULT[f"{key}_beam15_int8kv_rtf_b{batch}"] = round(lbkv_rtf, 3)

            # flagship Flamingo: the published model (Whisper-Flamingo
            # Large-V2, README.md:96-101) at the published protocol.
            # Free the plain flagship first — gated large-v2 is ~2.2B
            # params even as bf16 masters.
            del lmodel, lparams
            flmodel = _flamingo_model(ldims, bert_dim=768)
            xt = jnp.asarray(
                rng.standard_normal((1, batch, 64, 768)), jnp.float32
            )
            flb_rtf, _ = _decode_bench(flmodel, mel, sample_len, 15, 2, eot, xt=xt)
            print(f"{flagship_name} flamingo beam15: rtf={flb_rtf:.1f}", file=sys.stderr)
            _RESULT[f"flamingo_beam15_rtf_{key}"] = round(flb_rtf, 3)
            try:
                flbkv_rtf, _ = _decode_bench(
                    flmodel, mel, sample_len, 15, 2, eot, "int8kv", xt=xt
                )
            except Exception as e:
                flbkv_rtf = 0.0
                print(f"flagship flamingo int8kv failed: {e}", file=sys.stderr)
            print(
                f"{flagship_name} flamingo beam15 int8kv: rtf={flbkv_rtf:.1f}",
                file=sys.stderr,
            )
            _RESULT[f"flamingo_beam15_int8kv_rtf_{key}"] = round(flbkv_rtf, 3)
        except Exception as e:  # flagship failure must not lose the headline
            _RESULT["flagship_error"] = f"{type(e).__name__}: {e}"
            print(f"flagship bench failed: {e}", file=sys.stderr)

    _emit()


if __name__ == "__main__":
    main()
