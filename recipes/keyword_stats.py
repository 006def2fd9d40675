"""Keyword / dictionary coverage statistics (reference family H:
`statistic.py` — jieba-segmented keyword coverage for Taigi).

Run: python recipes/keyword_stats.py <config.yaml> [dict=words.txt]
                                                   [out=stats.json]

Computes, over the training split: vocabulary size, type/token counts,
dictionary coverage (fraction of tokens found in the provided lexicon),
and the top OOV words. Uses jieba segmentation when installed and the
text looks space-less (zh-style), whitespace tokenization otherwise.
"""

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import build_loader, load_config

from whisper_flamingo_tpu.tokenizer import get_tokenizer


def segment(text: str):
    if " " not in text.strip():
        try:
            import jieba

            return [w for w in jieba.lcut(text) if w.strip()]
        except ImportError:
            return list(text.strip())
    return text.split()


def main():
    cfg = load_config()
    out_path = cfg.extras.get("out", f"keyword_stats_{cfg.train_id}.json")
    lexicon = set()
    if cfg.extras.get("dict") and os.path.exists(cfg.extras["dict"]):
        with open(cfg.extras["dict"]) as f:
            lexicon = {line.strip().split()[0] for line in f if line.strip()}

    tokenizer = get_tokenizer(True, language=cfg.lang, task="transcribe")
    loader = build_loader(cfg, "train", tokenizer, training=False)

    counter: collections.Counter = collections.Counter()
    n_utts = 0
    for batch in loader:
        for text in batch["text"]:
            counter.update(segment(text))
            n_utts += 1

    total = sum(counter.values())
    covered = sum(c for w, c in counter.items() if w in lexicon) if lexicon else None
    oov = [w for w, _ in counter.most_common() if lexicon and w not in lexicon][:50]
    stats = {
        "n_utts": n_utts,
        "n_tokens": total,
        "n_types": len(counter),
        "dict_size": len(lexicon),
        "dict_coverage": (covered / total) if covered is not None and total else None,
        "top_words": counter.most_common(20),
        "top_oov": oov,
    }
    with open(out_path, "w") as f:
        json.dump(stats, f, ensure_ascii=False, indent=2)
    print(json.dumps({k: v for k, v in stats.items() if k != "top_words"},
                     ensure_ascii=False))


if __name__ == "__main__":
    main()
