"""Parity tests: the native C++ PTB tokenizer (native/ptb_tokenizer.cpp)
must produce byte-identical output to the pure-Python rules in
evalcap/tokenizer.py on caption-style text, including fuzzed inputs."""
import random
import string

import pytest

from simpleimagecaptionzoo_tpu.evalcap import _native
from simpleimagecaptionzoo_tpu.evalcap.tokenizer import tokenize_caption

needs_native = pytest.mark.skipif(not _native.available(),
                                  reason="native lib not built (make -C native)")

CASES = [
    "A man rides a surfboard on a wave.",
    "Two dogs, one black... and one white! (both happy)",
    "It's the cat's toy; he won't share -- never.",
    'a close-up of a "fancy" plate: pasta & sauce',
    "children playing soccer; it's 3:00pm, sunny",
    "a sign that reads [stop] {here} (now)",
    "don't can't won't shouldn't it's we're they've i'm you'd",
    "cannot gonna wanna gotta gimme lemme more'n d'ye",
    "",
    "   ",
    "one-word",
    "number 3.5 and 1,000 items",
]


@needs_native
def test_parity_on_cases():
    out = _native.ptb_tokenize_lines(CASES)
    for raw, native in zip(CASES, out):
        assert native == tokenize_caption(raw), raw


@needs_native
def test_parity_fuzz():
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,!?;:'\"()[]{}&%$#@-"
    lines = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(0, 60))) for _ in range(300)]
    out = _native.ptb_tokenize_lines(lines)
    mismatches = [(raw, tokenize_caption(raw), nat)
                  for raw, nat in zip(lines, out)
                  if nat != tokenize_caption(raw)]
    assert not mismatches, mismatches[:5]


@needs_native
def test_multithreaded_order_stable():
    lines = [f"caption number {i} with a dog." for i in range(100)]
    out1 = _native.ptb_tokenize_lines(lines, n_threads=1)
    out8 = _native.ptb_tokenize_lines(lines, n_threads=8)
    assert out1 == out8


def test_non_ascii_lines_match_python_rules():
    """Byte-wise C++ tolower/isspace only matches Python on ASCII; the
    binding must route non-ASCII lines (accented words, NBSP) to the
    pure-Python tokenizer so output never depends on whether the native
    library is built."""
    import pytest

    from simpleimagecaptionzoo_tpu.evalcap import _native
    from simpleimagecaptionzoo_tpu.evalcap.tokenizer import tokenize_caption
    if not _native.available():
        pytest.skip("native library not built")
    lines = ["two men at a CAFÉ.",
             "a dog runs fast!",           # non-breaking space
             "A plain ascii Caption."]
    out = _native.ptb_tokenize_lines(lines)
    assert out is not None and len(out) == len(lines)
    for line, got in zip(lines, out):
        assert got == tokenize_caption(line), (line, got)
