"""BPE primitives shared by the offline trainer (tools/train_bpe.py), the
deploy-path encoder (queries/tokenizer.py), and their tests.

Semantics are EXACTLY the distributed trainer's (queries/tokenizer.py
``_bpe_train_chain``) restated over symbol LISTS instead of the
double-space-joined string representation:

- a word's seed symbols are its characters plus the ``</w>`` end marker;
- each merge (a, b) applies LEFT-TO-RIGHT NON-OVERLAPPING: scan the
  symbol list once, and wherever ``s[i] == a and s[i+1] == b`` replace
  the pair with ``a+b`` and resume AFTER it — ``[a,a,a,a] -> [aa,aa]``,
  the same result the string form's ``replace(' a  b ', ' ab ')``
  produces (each match consumes one flanking space per side, so adjacent
  occurrences don't overlap);
- training picks the argmax pair by (count DESC, left ASC, right ASC).

Rank-ordered application (merge 1 everywhere, then merge 2, ...) equals
classic priority-queue BPE encoding because a merge's operand symbols are
created strictly before it (seed chars or lower-rank outputs), so a
later merge can never create an opportunity for an earlier one.

Why a driver-side trainer exists at all: the distributed chain is the
correctness gate (its oracle unrolls every iteration in SQL), but it
costs one Spark job per merge — right at 8 merges, wrong at thousands.
A real tokenizer is trained ONCE on a corpus SAMPLE whose distinct-word
table fits in memory (the HuggingFace-tokenizers shape: GPT-2's BPE was
fit on a sample, then frozen); this module is that trainer. The
DEPLOYED artifact is what must scale, and it does: encoding applies the
frozen merges only to the corpus's DISTINCT-WORD table (vocabulary-sized,
never corpus-sized) and broadcasts the per-word results back — see
queries/tokenizer.py tokenizer_bpe_encode_fixed.
"""

from __future__ import annotations

EOW = "</w>"  # end-of-word marker (Sennrich's convention)


def seed_symbols(word: str) -> list[str]:
    """A word's initial symbol list: characters + the end-of-word mark."""
    return list(word) + [EOW]


def apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """One merge pass, left-to-right non-overlapping (see module doc)."""
    out: list[str] = []
    i, n = 0, len(syms)
    ab = a + b
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def segment_word(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Apply the merge table in rank order to one word's seed symbols.

    Skips merges whose left symbol isn't present — a pure speedup (the
    pass would be a no-op), keeps the output identical.
    """
    syms = seed_symbols(word)
    present = set(syms)
    for a, b in merges:
        if a in present and b in present and len(syms) >= 2:
            merged = apply_merge(syms, a, b)
            if len(merged) != len(syms):
                syms = merged
                present = set(syms)
    return syms


def train_bpe(
    word_counts: list[tuple[str, int]], n_merges: int | None = None
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE over a (word, count) table: learn up to ``n_merges``
    merges (None = to exhaustion, i.e. until no adjacent pair remains).
    Returns (rank, left, right, pair_count) tuples — the same shape,
    ordering, and tie-break (count DESC, left ASC, right ASC) as the
    distributed ``_bpe_train_chain``, byte-for-byte reproducible."""
    vocab: list[tuple[list[str], int]] = [
        (seed_symbols(w), int(c)) for w, c in word_counts
    ]
    merges: list[tuple[int, str, str, int]] = []
    rank = 0
    while n_merges is None or rank < n_merges:
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rank += 1
        merges.append((rank, a, b, cnt))
        vocab = [
            (apply_merge(syms, a, b) if len(syms) >= 2 else syms, c)
            for syms, c in vocab
        ]
    return merges
