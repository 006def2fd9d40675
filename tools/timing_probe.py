"""Decompose the warm word-timestamp path (r4 verdict weak #5).

`transcribe(word_timestamps=True)` on a 20 s clip runs ~27x RT warm vs
~1660x for plain greedy (docs/performance.md serving notes) — a 60x
cliff attributed to "the alignment program" without a decomposition.
This probe splits the warm `find_alignment` cost (timing.py:127-195)
into its serial parts:

  1. the fused alignment program (encoder fwd + teacher-forced decoder
     fwd with cross-QK + head gather/softmax/z-norm/median), synced on
     the tiny text_probs leaf so the fetch is excluded;
  2. the (tp, Ta) cost-matrix fetch through the ~30 MB/s tunnel;
  3. DTW (device wavefront fill + trace fetch + host backtrace);
  4. host word-boundary math (split_to_word_tokens + numpy).

plus the floors that bound item 1: a null-program round trip (dispatch
latency), an encoder-only forward, and a decoder-only forward given
precomputed features — so the table shows whether the residual is
compute, transfer, or dispatch, and what reusing the decode's encoder
features could save at most.

Usage: python tools/timing_probe.py [model] [clip_seconds] [n_text_tokens]
       # defaults: small 20 80
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, iters=5, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.audio import N_SAMPLES, log_mel_spectrogram, pad_or_trim
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import (
        Whisper, decoder_apply, encoder_apply, init_params,
    )
    from whisper_flamingo_tpu.ops.dtw import dtw
    from whisper_flamingo_tpu.profiling import model_flops
    from whisper_flamingo_tpu.timing import _alignment_program, _token_bucket, find_alignment
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    clip_s = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    n_text = int(sys.argv[3]) if len(sys.argv) > 3 else 80

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    tokenizer = get_tokenizer(True, language="en", task="transcribe")

    rng = np.random.default_rng(0)
    wave = rng.standard_normal(int(16000 * clip_s)).astype(np.float32) * 0.05
    mel = log_mel_spectrogram(
        np.asarray(pad_or_trim(wave, N_SAMPLES)), n_mels=dims.n_mels
    )
    num_frames = int(clip_s * 100)
    text_tokens = rng.integers(1000, 20000, n_text).tolist()

    # --- end-to-end warm find_alignment -----------------------------------
    t_e2e = best_of(lambda: find_alignment(
        model, tokenizer, text_tokens, mel, num_frames))
    print(f"find_alignment warm ({model_name}, {clip_s:.0f}s, {n_text} tok): "
          f"{t_e2e * 1e3:.1f} ms  ({clip_s / t_e2e:.0f}x RT)")

    # --- decomposed terms --------------------------------------------------
    tokens = np.array([*tokenizer.sot_sequence, tokenizer.no_timestamps,
                       *text_tokens, tokenizer.eot], np.int32)
    n_tok = len(tokens)
    n_sot = len(tokenizer.sot_sequence)
    tp = _token_bucket(n_tok)
    tokens_p = np.pad(tokens, (0, tp - n_tok), constant_values=tokenizer.eot)
    heads = np.argwhere(model.get_alignment_heads())
    program = _alignment_program(
        model.dims, model.dtype, tp, n_sot, int(tokenizer.eot), 7, len(heads))
    mel_d = jnp.asarray(mel)[None]
    toks_d = jnp.asarray(tokens_p[None])
    hl, hh = jnp.asarray(heads[:, 0]), jnp.asarray(heads[:, 1])
    args = (model.params, mel_d, toks_d, np.int32(n_tok),
            np.int32(num_frames // 2), np.float32(1.0), hl, hh)

    t_prog = best_of(lambda: np.asarray(program(*args)[0]))  # tiny leaf sync
    out = program(*args)
    t_both = best_of(lambda: jax.device_get(program(*args)))
    matrix_host = np.asarray(jax.device_get(out[1]))
    mat = matrix_host[n_sot: n_tok - 1, : num_frames // 2]
    mb = matrix_host.size * 4 / 1e6
    t_dtw = best_of(lambda: dtw(-mat))

    def host_tail():
        ti, xi = dtw(-mat)
        words, word_tokens = tokenizer.split_to_word_tokens(
            list(text_tokens) + [tokenizer.eot])
        np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))
        np.pad(np.diff(ti), (1, 0), constant_values=1)

    t_tail = best_of(host_tail) - t_dtw

    # --- floors -------------------------------------------------------------
    null = jax.jit(lambda x: x + 1)
    t_null = best_of(lambda: np.asarray(null(np.float32(1.0))))

    enc = jax.jit(lambda p, m: encoder_apply(p, dims, m, dtype=jnp.bfloat16))
    feats = enc(model.params, mel_d)
    t_enc = best_of(lambda: np.asarray(enc(model.params, mel_d)[0, 0, 0]))

    dec = jax.jit(lambda p, t, f: decoder_apply(
        p, dims, t, f, dtype=jnp.bfloat16, return_cross_qk=True)[0][0, 0, 0])
    t_dec = best_of(lambda: np.asarray(dec(model.params, toks_d, feats)))

    print(f"  alignment program (sync on probs) : {t_prog * 1e3:7.1f} ms")
    print(f"    encoder-only fwd                : {t_enc * 1e3:7.1f} ms")
    print(f"    decoder-fwd+cross-QK (tp={tp:4d}) : {t_dec * 1e3:7.1f} ms")
    print(f"    null-program round trip         : {t_null * 1e3:7.1f} ms")
    print(f"  matrix fetch (+{mb:.1f} MB @ tunnel) : {(t_both - t_prog) * 1e3:7.1f} ms")
    print(f"  DTW (device fill + host backtrace): {t_dtw * 1e3:7.1f} ms")
    print(f"  host word-boundary math           : {t_tail * 1e3:7.1f} ms")
    other = t_e2e - t_prog - (t_both - t_prog) - t_dtw - t_tail
    print(f"  unaccounted (host glue)           : {other * 1e3:7.1f} ms")

    # FLOPs context for the program floor
    f_enc = model_flops(dims, 1, mel_frames=3000, text_len=0)
    f_all = model_flops(dims, 1, mel_frames=3000, text_len=tp)
    print(f"\nFLOPs: encoder {f_enc / 1e9:.1f} G, +decoder(tp) "
          f"{f_all / 1e9:.1f} G -> program at "
          f"{f_all / t_prog / 1e12:.2f} TF/s effective")


if __name__ == "__main__":
    main()
