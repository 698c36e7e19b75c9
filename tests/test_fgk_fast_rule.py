"""Cross-validate the vectorizable successor rule against the exact DFS.

The C++ runtime and the TPU chunked encoder use
``fast_find_succ_slot(f, k_slot)`` (lowest slot with freq == f within the
clean sorted prefix [0..k_slot]) instead of the reference's pruned DFS
(huffman.cpp:157-184). This test instruments every update of every climb on
adversarial and random streams and asserts both rules agree — including the
exclusion outcome (self / own parent -> no swap).
"""

import random

import pytest

from huffman_codec_tpu.pyref.fgk import NIL, FGKTree


class InstrumentedTree(FGKTree):
    """FGKTree whose update() checks fast rule == DFS at every climb level."""

    mismatches: list

    def __init__(self):
        super().__init__()
        self.mismatches = []

    def update(self, sym: int) -> None:  # mirrors FGKTree.update
        k = self.symbol_slot[sym]
        if k == NIL:
            old = self.nyt
            leaf = old + 1
            new_nyt = old + 2
            self.left[old] = new_nyt
            self.right[old] = leaf
            self.parent[leaf] = old
            self.parent[new_nyt] = old
            self.freq[leaf] = 0
            self.freq[new_nyt] = 0
            self.symbol[leaf] = sym
            self.left[leaf] = self.right[leaf] = NIL
            self.left[new_nyt] = self.right[new_nyt] = NIL
            self.nyt = new_nyt
            self.symbol_slot[sym] = leaf
            self.n_slots = max(self.n_slots, new_nyt + 1)
            k = leaf

        while self.parent[k] != NIL:
            succ_dfs = self._find_succ_slot(self.freq[k])
            succ_fast = self.fast_find_succ_slot(self.freq[k], k)
            # Compare the *effective* decision: swap target or no-op.
            eff_dfs = (
                succ_dfs
                if succ_dfs not in (NIL, k, self.parent[k])
                else NIL
            )
            eff_fast = (
                succ_fast
                if succ_fast not in (NIL, k, self.parent[k])
                else NIL
            )
            if eff_dfs != eff_fast:
                self.mismatches.append((self.freq[k], k, succ_dfs, succ_fast))
            if eff_dfs != NIL:
                self._swap(k, eff_dfs)
                k = eff_dfs
            self.freq[k] += 1
            k = self.parent[k]
        self.freq[k] += 1


def _run(data: bytes):
    tree = InstrumentedTree()
    for sym in data:
        tree.encode(sym)
        tree.update(sym)
    assert tree.mismatches == [], tree.mismatches[:10]


@pytest.mark.parametrize(
    "data",
    [
        b"a",
        b"ab" * 50,
        b"abracadabra" * 20,
        bytes(range(256)),
        bytes(range(256)) * 3,
        b"\x00" * 500,
        bytes([i % 2 for i in range(400)]),
        bytes([i % 3 for i in range(400)]),
        # Fibonacci-like skew: maximally unbalanced tree
        b"".join(bytes([i]) * (2 ** min(i, 10)) for i in range(16)),
    ],
)
def test_fast_rule_matches_dfs(data):
    _run(data)


def test_fast_rule_matches_dfs_random():
    rng = random.Random(1234)
    for trial in range(30):
        alphabet = rng.choice([2, 3, 5, 16, 64, 256])
        n = rng.randrange(50, 3000)
        data = bytes(rng.randrange(alphabet) for _ in range(n))
        _run(data)


def test_fast_rule_matches_dfs_runs():
    rng = random.Random(99)
    for trial in range(20):
        data = bytearray()
        while len(data) < 2000:
            data += bytes([rng.randrange(6)]) * rng.randrange(1, 300)
        _run(bytes(data))


def test_fast_rule_on_corpus_prefix(corpus):
    # real image data, first 24 KiB of two corpus files (pyref is slow)
    for path in corpus[:2]:
        _run(path.read_bytes()[:24576])
