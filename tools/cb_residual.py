"""Decompose the pooled continuous-batching gap to its computed ideal.

`tools/cb_ab.py` measured pooled refill at 1.35x vs padded with a
decode-only ideal of n_req*hi/total_tokens = 1.84x, and docs attributed
the residual to "the prefill wave + tail underfill" WITHOUT measuring
either term (r4 verdict weak #2). This tool measures them:

1. **t_prefill** — the pool prefill dispatch (encoder forward + first
   token for every request, ONE bucketed program), timed alone. The
   padded baseline pays the same encoder work inside its batches, so
   this term is *shared*, and the decode-only "ideal" overstates the
   reachable ratio: reachable = (t_prefill + pad_decode) /
   (t_prefill + ideal_decode).
2. **t_step** — steady-state per-iteration cost of the pooled program
   at full occupancy, from the SLOPE of two uniform-budget runs
   (uniform budgets make the device loop's step count exact and the
   splice-event count constant, so the slope isolates the step).
3. **steps_sim / events_sim** — a host replica of `run_pooled`'s
   outer(splice)/inner(step) loop semantics (serving.py:341-444) run on
   the real budget draw: the exact iteration count the device executes,
   including the drain-tail underfill (finished slots keep stepping in
   the fixed batch-8 program while the longest rows drain).

The decomposition then predicts the pooled wall time as
t_prefill + intercept + steps_sim * t_step and reports closure vs the
measured run, the underfill share (steps_sim - ideal_steps), and the
ORACLE scheduling bound: the same pool admitted longest-cap-first (LPT
order — with caps == true output lengths this is the best any admission
order can do, an upper bound on what smarter scheduling could recover
from the tail).

Usage: python tools/cb_residual.py [model] [n_requests] [slots]
       # defaults: small 32 8  (the cb_ab configuration, same seed)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def simulate(budgets, slots):
    """Host replica of run_pooled's loop nest (serving.py:341-444).

    Returns (inner_steps, splice_events, busy_row_steps). A spliced row
    has budget-1 tokens left to generate (prefill emitted its first
    token, serving.py:196-206); the inner loop exits as soon as any slot
    finishes while pool rows remain, so pool-phase refill costs no idle
    steps — the underfill lives in the drain tail.
    """
    n = len(budgets)
    remaining = [0] * slots
    finished = [True] * slots
    nxt = steps = events = busy = 0
    while any(not f for f in finished) or nxt < n:
        spliced = False
        for s in range(slots):
            if finished[s] and nxt < n:
                remaining[s] = budgets[nxt] - 1
                finished[s] = remaining[s] <= 0
                nxt += 1
                spliced = True
        if spliced:
            events += 1
        while any(not f for f in finished) and not (
            nxt < n and any(finished)
        ):
            steps += 1
            for s in range(slots):
                if not finished[s]:
                    busy += 1
                    remaining[s] -= 1
                    if remaining[s] == 0:
                        finished[s] = True
    return steps, events, busy


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/wf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from whisper_flamingo_tpu.audio import (
        N_SAMPLES, log_mel_spectrogram, pad_or_trim,
    )
    from whisper_flamingo_tpu.decoding import DecodingOptions, DecodingTask
    from whisper_flamingo_tpu.models.dims import MODEL_DIMS
    from whisper_flamingo_tpu.models.whisper import Whisper, init_params
    from whisper_flamingo_tpu.serving import ContinuousBatcher
    from whisper_flamingo_tpu.tokenizer import get_tokenizer

    model_name = sys.argv[1] if len(sys.argv) > 1 else "small"
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    lo, hi = 16, 96

    dims = MODEL_DIMS[model_name]
    params = jax.jit(lambda k: init_params(k, dims))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    model = Whisper(dims=dims, params=params, dtype=jnp.bfloat16)
    eot = get_tokenizer(True, language="en", task="transcribe").eot

    rng = np.random.default_rng(0)  # same draw as cb_ab.py
    waves = [rng.standard_normal(480_000).astype(np.float32) * 0.05
             for _ in range(n_req)]
    budgets = rng.integers(lo, hi + 1, n_req).tolist()
    total_tokens = sum(budgets)
    audio_s = n_req * 30.0

    opts = dict(language="en", without_timestamps=True, fp16=True,
                suppress_tokens=f"-1,{eot}")
    mels = log_mel_spectrogram(
        np.stack([np.asarray(pad_or_trim(w, N_SAMPLES)) for w in waves]),
        n_mels=dims.n_mels,
    )
    req_mels = [mels[i] for i in range(n_req)]

    cb = ContinuousBatcher(
        model, options=DecodingOptions(sample_len=hi, **opts), slots=slots,
    )
    progs = cb._programs
    prep = cb._prep()

    def sync(x):
        # fetch a SMALL output leaf: any output of the dispatched program
        # waits for the whole program, and the tunnel moves ~30 MB/s, so
        # syncing on a cache slab would poison the timing
        leaf = min(jax.tree.leaves(x), key=lambda a: a.size)
        np.asarray(leaf)

    def timed(fn, iters=5, reps=3):
        fn()  # compile / cache-load
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # --- 1. prefill wave -------------------------------------------------
    reqs = [(m, b) for m, b in zip(req_mels, budgets)]
    t_prefill = timed(lambda: sync(cb._prefill_many(reqs)))
    pool = cb._prefill_many(reqs)
    print(f"prefill wave ({n_req} rows, one dispatch): {t_prefill:.3f}s")

    # --- 2. per-step cost from two uniform-budget runs --------------------
    def pooled_run(pool_, n):
        state = progs["empty_state"](slots)
        out = progs["run_pooled"](prep, pool_, state, np.int32(n))
        sync(out)

    uniform = {}
    for B in (32, 96):
        ub = [B] * n_req
        upool = cb._prefill_many([(m, B) for m in req_mels])
        t = timed(lambda p=upool: pooled_run(p, n_req), iters=3)
        steps_u, events_u, _ = simulate(ub, slots)
        uniform[B] = (t, steps_u, events_u)
        print(f"uniform B={B}: {t:.3f}s  sim={steps_u} steps, "
              f"{events_u} splice events")
    (tA, sA, _), (tB, sB, _) = uniform[32], uniform[96]
    t_step = (tB - tA) / (sB - sA)
    intercept = tA - sA * t_step  # dispatch + harvest + splice events
    print(f"t_step = {t_step * 1e3:.3f} ms/iter (slope), "
          f"fixed overhead = {intercept:.3f}s")

    # --- 3. real budgets: simulate, predict, measure ----------------------
    steps_r, events_r, busy_r = simulate(budgets, slots)
    ideal_steps = -(-total_tokens // slots)
    underfill = steps_r - ideal_steps
    t_real = timed(lambda: pooled_run(pool, n_req), iters=3)
    t_pred = intercept + steps_r * t_step
    print(f"\nreal budgets ({lo}-{hi}, total {total_tokens} tok): "
          f"sim={steps_r} steps ({events_r} events), "
          f"occupancy {busy_r / (steps_r * slots):.1%}")
    print(f"  ideal steps {ideal_steps} -> underfill {underfill} steps "
          f"({underfill * t_step:.3f}s, drain tail)")
    print(f"  measured {t_real:.3f}s vs predicted {t_pred:.3f}s "
          f"(closure {t_pred / t_real:.1%})")

    # --- 4. oracle admission order (LPT): bound of scheduler gains --------
    lpt = sorted(budgets, reverse=True)
    steps_l, events_l, _ = simulate(lpt, slots)
    order = sorted(range(n_req), key=lambda i: -budgets[i])
    lpt_pool = cb._prefill_many([(req_mels[i], budgets[i]) for i in order])
    t_lpt = timed(lambda: pooled_run(lpt_pool, n_req), iters=3)
    print(f"LPT admission (oracle bound): sim={steps_l} steps "
          f"(saves {steps_r - steps_l}), measured {t_lpt:.3f}s "
          f"({t_real / t_lpt:.2f}x vs arrival order)")

    # --- 5. padded baseline + corrected reachable ratio -------------------
    task = DecodingTask(model, DecodingOptions(sample_len=hi, **opts))
    task.run(mels[:slots])
    if n_req % slots:
        task.run(mels[-(n_req % slots):])
    t0 = time.perf_counter()
    for i in range(0, n_req, slots):
        task.run(mels[i: i + slots])
    t_pad = time.perf_counter() - t0

    t_pool_total = t_prefill + t_real
    ideal_decode = intercept + ideal_steps * t_step
    reachable = t_pad / (t_prefill + ideal_decode)
    print(f"\npadded ({slots}/batch, {hi} tok): {t_pad:.3f}s  "
          f"{audio_s / t_pad:.1f}x RT")
    print(f"pooled total (prefill + decode): {t_pool_total:.3f}s  "
          f"{audio_s / t_pool_total:.1f}x RT  "
          f"({t_pad / t_pool_total:.2f}x vs padded)")
    print(f"decode-only ideal {n_req * hi / total_tokens:.2f}x; "
          f"REACHABLE (shared prefill + fixed overhead + zero underfill): "
          f"{reachable:.2f}x")
    share = t_prefill + underfill * t_step + intercept
    print(f"residual terms: prefill {t_prefill:.3f}s, underfill "
          f"{underfill * t_step:.3f}s, dispatch/harvest {intercept:.3f}s "
          f"(together {share:.3f}s of the {t_pool_total:.3f}s total)")


if __name__ == "__main__":
    main()
