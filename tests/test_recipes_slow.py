"""Opt-in end-to-end recipe smokes as pytest (slow; run with
``WF_RUN_SLOW=1 python -m pytest tests/test_recipes_slow.py``).

Each recipe runs as a subprocess on CPU with the synthetic smoke configs —
the same matrix exercised manually during development.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("WF_RUN_SLOW"), reason="set WF_RUN_SLOW=1 to run recipe smokes"
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RECIPES = [
    ("recipes/whisper_ft.py", ["configs/smoke/ft.yaml"]),
    ("recipes/whisper_ft.py", ["configs/smoke/ft_dp.yaml"]),
    ("recipes/trans_asr.py", ["configs/smoke/trans_asr.yaml"]),
    ("recipes/transkd_asr.py", ["configs/smoke/transkd.yaml"]),
    ("recipes/distil_prompt.py", ["configs/smoke/distil_prompt.yaml"]),
    ("recipes/av_train.py", ["configs/smoke/av.yaml"]),
    ("recipes/evaluate.py", ["configs/smoke/ft.yaml", "mode=decode", "beam_size=2"]),
    ("recipes/generate_pseudo_labels.py",
     ["configs/smoke/trans_asr.yaml", "out=/tmp/wf_pytest_pl.csv"]),
    ("recipes/keyword_stats.py",
     ["configs/smoke/ft.yaml", "out=/tmp/wf_pytest_kw.json"]),
]


@pytest.mark.parametrize("script,args", RECIPES, ids=[r[0] + ":" + r[1][0] for r in RECIPES])
def test_recipe_smoke(script, args):
    result = subprocess.run(
        [sys.executable, script, *args],
        cwd=ROOT, capture_output=True, text=True, timeout=560,
    )
    assert result.returncode == 0, result.stderr[-3000:]
