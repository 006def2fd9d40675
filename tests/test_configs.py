"""Every shipped config must parse into the typed schema (the reference's
75-config matrix had configs referencing deleted collators — SURVEY.md
§2.3 bit-rot note; this suite keeps ours load-checked)."""

import glob
import os

import pytest

from whisper_flamingo_tpu.config import TrainConfig
from whisper_flamingo_tpu.models.dims import MODEL_DIMS

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"), recursive=True))


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.relpath(p, ROOT) for p in CONFIGS]
)
def test_config_parses(path):
    cfg = TrainConfig.from_yaml(path)
    assert cfg.train_id, "every config needs a train_id"
    assert cfg.model_name in MODEL_DIMS, cfg.model_name
    assert cfg.num_train_steps > 0 and cfg.batch_size > 0
    assert cfg.monitor
    # flamingo configs must declare their conditioning-stream count and,
    # when conditioning text comes from per-language dirs, match counts
    if cfg.add_gated_x_attn:
        assert cfg.num_langs >= 1
        if cfg.translation_base_dirs and not cfg.extras.get("video"):
            assert len(cfg.translation_base_dirs) == cfg.num_langs, path
    if cfg.extras.get("oracle"):
        assert cfg.add_gated_x_attn, "oracle conditioning implies gated x-attn"


def test_config_count_covers_families():
    families = {os.path.basename(os.path.dirname(p)) for p in CONFIGS}
    assert {"audio", "audio-text", "audio-visual", "distil", "smoke"} <= families
    assert len(CONFIGS) >= 35
