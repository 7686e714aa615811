"""Property tests (hypothesis) for the anagram-key blocking bound
behind ``jaro_winkler_verify_pairs`` (ytspark/operators/fuzzy.py).

The production claim: for strings up to ``JW_BLOCK_MAX_LEN`` chars,
any pair with Jaro-Winkler >= ``JW_THRESHOLD`` shares a deletion-1
variant of its character-SORTED form. The derivation (multiset overlap
>= 0.9 * maxlen) is in the module; these tests attack it with random
pairs so a future edit to the kernel, the threshold, or the length
bound cannot silently reopen the recall hole the round-11 rewrite
closed. No Spark session needed — pure kernel math.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ytspark.operators.fuzzy import (
    JW_BLOCK_MAX_LEN,
    JW_THRESHOLD,
    jaro_winkler,
)


def _sorted_del1(s: str) -> set[str]:
    t = "".join(sorted(s))
    return {t} | {t[:i] + t[i + 1:] for i in range(len(t))}


def _blocked(a: str, b: str) -> bool:
    return bool(_sorted_del1(a) & _sorted_del1(b))


# small alphabet: forces high-similarity collisions hypothesis would
# almost never find over full unicode
_names = st.text(alphabet="ab0123", min_size=1, max_size=JW_BLOCK_MAX_LEN)


@given(_names, _names)
@settings(max_examples=2000, deadline=None)
def test_no_qualifying_pair_escapes_the_blocking(a, b):
    if jaro_winkler(a, b) >= JW_THRESHOLD:
        assert _blocked(a, b), (a, b, jaro_winkler(a, b))


@given(_names)
@settings(max_examples=300, deadline=None)
def test_single_edits_always_blocked(s):
    # substitutions, deletions, and adjacent transpositions of any
    # string stay inside its own block — the ER bread-and-butter edits
    if len(s) >= 2:
        i = len(s) // 2
        transposed = s[:i - 1] + s[i] + s[i - 1] + s[i + 1:]
        assert _blocked(s, transposed)
        assert _blocked(s, s[:i] + s[i + 1:])  # deletion
    assert _blocked(s, ("z" + s[1:]) if s else "z")  # substitution


def test_known_raw_deletion_blind_spot_is_covered():
    # the pair class that proved raw-string deletion-1 blocking wrong:
    # digit rotations score 0.9889 yet share no raw deletion variant
    a, b = "Customer#000000021", "Customer#000000120"
    assert jaro_winkler(a, b) >= JW_THRESHOLD
    raw = lambda s: {s} | {s[:i] + s[i + 1:] for i in range(len(s))}  # noqa: E731
    assert not (raw(a) & raw(b))  # raw blocking misses it...
    assert _blocked(a, b)  # ...anagram blocking does not
