"""CLI end-to-end: export a debug checkpoint to OpenAI .pt format, then
transcribe a WAV through `python -m whisper_flamingo_tpu` loading it."""

import os
import subprocess
import sys
import wave

import jax
import numpy as np

from whisper_flamingo_tpu.models.dims import MODEL_DIMS
from whisper_flamingo_tpu.models.whisper import init_params
from whisper_flamingo_tpu.training.checkpoints import save_torch_checkpoint


def test_cli_transcribe_roundtrip(tmp_path):
    dims = MODEL_DIMS["debug"]
    params = init_params(jax.random.PRNGKey(0), dims)
    ckpt = tmp_path / "debug.pt"
    save_torch_checkpoint(params, dims, str(ckpt))

    wav_path = tmp_path / "x.wav"
    rng = np.random.default_rng(0)
    data = (rng.standard_normal(16000 * 3) * 1000).astype(np.int16)
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(data.tobytes())

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the image's sitecustomize re-registers the axon TPU backend (forcing
    # jax_platforms="axon,cpu") whenever this var is set, which overrides
    # JAX_PLATFORMS=cpu and makes the subprocess dial the remote chip;
    # drop it so the CLI round-trip is hermetic on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    result = subprocess.run(
        [
            sys.executable, "-m", "whisper_flamingo_tpu", str(wav_path),
            "--model", str(ckpt), "--language", "en", "--beam_size", "None",
            "--best_of", "None", "--temperature_increment_on_fallback", "None",
            "--fp16", "False", "--verbose", "False",
            "--output_dir", str(tmp_path), "--output_format", "json",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    out_file = tmp_path / "x.json"
    assert out_file.exists(), result.stderr[-2000:]
    import json

    data = json.loads(out_file.read_text())
    assert data["language"] == "en"
    assert "segments" in data
