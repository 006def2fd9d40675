"""Seeded fuzz harness: random number-phrase prose, cross-checked between
whisper_flamingo_tpu.normalizers.EnglishTextNormalizer and the reference
engine (/root/reference/whisper/normalizers/english.py, read-only).

Usage: python tools/normalizer_fuzz.py [n_cases] [seed]
Prints divergent cases (ours != theirs) and a summary. The same generator
is imported by tests/test_normalizers.py::test_english_normalizer_fuzz.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ONES = ["one", "two", "three", "four", "five", "six", "seven", "eight",
        "nine"]
TEENS = ["ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
         "sixteen", "seventeen", "eighteen", "nineteen"]
TENS = ["twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty",
        "ninety"]
ZEROS = ["zero", "oh", "o"]
SCALES = ["hundred", "thousand", "million", "billion", "trillion"]
ORDINALS = ["first", "second", "third", "fourth", "fifth", "eighth",
            "ninth", "twelfth", "twentieth", "thirtieth", "hundredth",
            "thousandth", "millionth"]
ORD_SUFFIXED = ["1st", "2nd", "3rd", "42nd", "23rd", "101st", "11th",
                "13th", "0th"]
PLURAL_SUFFIXED = ["1960s", "70s", "20s", "1800s", "90s", "100s"]
DIGITS = ["0", "1", "7", "12", "42", "100", "1000", "1,000", "2,500",
          "1.5", "0.79", "3.14", "10,000,000", "1960", "2024"]
CURRENCY_PRE = ["$", "£", "€"]
CURRENCY_WORDS = ["dollars", "dollar", "cents", "cent", "pounds", "pence",
                  "euros"]
PERCENTY = ["percent", "per cent", "%"]
FRACTIONS = ["half", "halves", "quarter", "quarters", "third", "thirds"]
MULT = ["double", "triple"]
SIGNS = ["minus", "negative", "plus"]
PROSE = ["the", "a", "about", "roughly", "only", "nearly", "she said",
         "we counted", "he owes", "they found", "items", "people", "birds",
         "at", "of", "and", "or", "exactly", "around", "in", "over"]
CONNECT = ["and", "point", "and a", ""]


def _number_phrase(rng: random.Random) -> str:
    """One random spoken-number-ish phrase (may be ill-formed on purpose)."""
    kind = rng.randrange(12)
    if kind == 0:  # plain multi-part cardinal
        parts = []
        if rng.random() < 0.3:
            parts.append(rng.choice(SIGNS))
        parts.append(rng.choice(ONES + TEENS + TENS))
        for _ in range(rng.randrange(4)):
            parts.append(rng.choice(ONES + TEENS + TENS + SCALES + ["and"]))
        return " ".join(parts)
    if kind == 1:  # oh/double chains
        parts = [rng.choice(MULT + ZEROS)]
        for _ in range(rng.randrange(1, 5)):
            parts.append(rng.choice(ONES + ZEROS + TEENS))
        return " ".join(parts)
    if kind == 2:  # decimals
        a = rng.choice(ONES + TENS + TEENS + DIGITS)
        tail = " ".join(
            rng.choice(ONES + ZEROS) for _ in range(rng.randrange(1, 4))
        )
        return f"{a} point {tail}"
    if kind == 3:  # currency, spoken
        amt = " ".join(
            rng.choice(ONES + TEENS + TENS + SCALES + ["and"])
            for _ in range(rng.randrange(1, 4))
        )
        cur = rng.choice(CURRENCY_WORDS)
        extra = ""
        if rng.random() < 0.4:
            extra = " and " + rng.choice(ONES + TENS) + " " + rng.choice(
                ["cents", "cent", "pence"]
            )
        return f"{amt} {cur}{extra}"
    if kind == 4:  # currency, symbolic
        return rng.choice(CURRENCY_PRE) + rng.choice(DIGITS) + rng.choice(
            ["", " million", " billion", ".50", ".5"]
        )
    if kind == 5:  # percent
        return rng.choice(ONES + TENS + DIGITS) + " " + rng.choice(PERCENTY)
    if kind == 6:  # ordinals
        parts = []
        if rng.random() < 0.5:
            parts.append(rng.choice(TENS + ONES + TEENS))
        parts.append(rng.choice(ORDINALS + ORD_SUFFIXED))
        return " ".join(parts)
    if kind == 7:  # plural/era suffixed
        return rng.choice(PLURAL_SUFFIXED + DIGITS) + rng.choice(
            ["", " and " + rng.choice(ONES)]
        )
    if kind == 8:  # and-a-half family
        base = rng.choice(ONES + TENS + DIGITS + ["a hundred", "a million"])
        return f"{base} and a {rng.choice(FRACTIONS)}"
    if kind == 9:  # year-like pairs
        return (
            rng.choice(["nineteen", "twenty", "eighteen"]) + " "
            + rng.choice(TENS + TEENS + ZEROS) + " "
            + rng.choice(ONES + ZEROS + [""])
        ).strip()
    if kind == 10:  # bare scale ladders / a-prefixed
        return rng.choice(["a", "one", "two"]) + " " + " ".join(
            rng.choice(SCALES) for _ in range(rng.randrange(1, 4))
        )
    # mixed digit+word
    return rng.choice(DIGITS) + " " + rng.choice(
        SCALES + CURRENCY_WORDS + PERCENTY + ONES
    )


def gen_case(rng: random.Random) -> str:
    """A prose sentence with 1-3 embedded number phrases."""
    chunks = []
    for _ in range(rng.randrange(1, 4)):
        chunks.append(rng.choice(PROSE))
        chunks.append(_number_phrase(rng))
        if rng.random() < 0.4:
            chunks.append(rng.choice(PROSE))
    s = " ".join(chunks)
    # sprinkle punctuation/casing the normalizer must strip
    if rng.random() < 0.3:
        s = s.replace(" ", ", ", 1)
    if rng.random() < 0.2:
        s = s.capitalize() + "."
    if rng.random() < 0.1:
        s += "!"
    return s


def load_reference_english():
    import importlib.util
    import types

    spec_b = importlib.util.spec_from_file_location(
        "ref_norm_basic", "/root/reference/whisper/normalizers/basic.py"
    )
    basic = importlib.util.module_from_spec(spec_b)
    spec_b.loader.exec_module(basic)
    pkg = types.ModuleType("ref_norm_pkg")
    pkg.__path__ = ["/root/reference/whisper/normalizers"]
    sys.modules["ref_norm_pkg"] = pkg
    sys.modules["ref_norm_pkg.basic"] = basic
    basic.__name__ = "ref_norm_pkg.basic"
    spec_e = importlib.util.spec_from_file_location(
        "ref_norm_pkg.english", "/root/reference/whisper/normalizers/english.py"
    )
    english = importlib.util.module_from_spec(spec_e)
    spec_e.loader.exec_module(english)
    return english


def run_fuzz(n: int, seed: int, max_report: int = 20):
    from whisper_flamingo_tpu.normalizers import EnglishTextNormalizer

    english = load_reference_english()
    ours = EnglishTextNormalizer()
    theirs = english.EnglishTextNormalizer()
    rng = random.Random(seed)
    bad = []
    for i in range(n):
        case = gen_case(rng)
        a, b = ours(case), theirs(case)
        if a != b:
            bad.append((case, a, b))
    return bad


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    bad = run_fuzz(n, seed)
    for case, a, b in bad[:20]:
        print(f"IN   : {case!r}\nOURS : {a!r}\nREF  : {b!r}\n")
    print(f"{len(bad)}/{n} divergent")
