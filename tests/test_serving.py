"""Batch serving wrapper: request padding, batch bucketing, unpadding."""

import numpy as np

from whisper_flamingo_tpu import load_model
from whisper_flamingo_tpu.decoding import DecodingOptions
from whisper_flamingo_tpu.serving import BatchTranscriber


def test_batch_transcriber_pads_and_unpads():
    model = load_model("debug")
    svc = BatchTranscriber(
        model,
        options=DecodingOptions(
            language="en", without_timestamps=True, sample_len=6, fp16=False
        ),
        batch_sizes=(2, 4),
    )
    rng = np.random.default_rng(0)
    waves = [rng.standard_normal(16000 * (i % 3 + 1)).astype(np.float32) * 0.05
             for i in range(5)]
    results = svc.transcribe_segments(waves)
    assert len(results) == 5
    assert all(isinstance(r.text, str) for r in results)

    # same audio decoded in different batch groupings gives the same text
    again = svc.transcribe_segments(waves[:1])
    assert again[0].tokens == results[0].tokens
