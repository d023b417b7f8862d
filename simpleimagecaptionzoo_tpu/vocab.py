"""Caption vocabulary.

Mirrors the behavioral contract of the reference's ``Caption_Vocabulary``
(ClassRepository/CaptionVocabClass.py:1-19) and the vocab build procedure of
PreProcess/Build_caption_vocab.py:22-45: words seen at least ``threshold``
times in the train split, specials inserted first in the order
``<pad>, <sta>, <end>, <unk>`` so their ids are 0/1/2/3.

The class is pickle-compatible in spirit (same attribute names ``word2ix`` /
``ix2word`` / ``idx``) so vocab pickles produced by either framework are
interchangeable via :func:`load_vocab`.
"""
from __future__ import annotations

import pickle
from collections import Counter
from typing import Iterable, List

SPECIALS = ("<pad>", "<sta>", "<end>", "<unk>")


class Vocabulary:
    """word <-> index mapping; calling with an OOV word returns ``<unk>``'s id."""

    def __init__(self) -> None:
        self.word2ix: dict = {}
        self.ix2word: dict = {}
        self.idx: int = 0

    def add_word(self, word: str) -> None:
        if word not in self.word2ix:
            self.word2ix[word] = self.idx
            self.ix2word[self.idx] = word
            self.idx += 1

    def __len__(self) -> int:
        return len(self.word2ix)

    def __call__(self, word: str) -> int:
        return self.word2ix.get(word, self.word2ix["<unk>"])

    # ---- conveniences beyond the reference ----
    def encode_tokens(self, tokens: Iterable[str]) -> List[int]:
        """``[<sta>] + tokens + [<end>]`` as ids (reference: Datasets.py:48-52)."""
        ids = [self.word2ix["<sta>"]]
        ids.extend(self(tok) for tok in tokens)
        ids.append(self.word2ix["<end>"])
        return ids

    def decode_ids(self, ids: Iterable[int]) -> List[str]:
        """ids -> words, stopping at ``<end>`` and skipping ``<sta>``
        (reference: Engine.py:288-297)."""
        words = []
        for i in ids:
            word = self.ix2word[int(i)]
            if word in ("<end>", "<pad>"):
                break
            if word != "<sta>":
                words.append(word)
        return words


def build_vocab(token_lists: Iterable[Iterable[str]], threshold: int = 5) -> Vocabulary:
    """Build a vocabulary from an iterable of token lists.

    Matches PreProcess/Build_caption_vocab.py:22-45: count train tokens, keep
    words with count >= threshold (in first-seen order), specials first.
    """
    counter: Counter = Counter()
    for tokens in token_lists:
        counter.update(tokens)
    vocab = Vocabulary()
    for sp in SPECIALS:
        vocab.add_word(sp)
    for word, cnt in counter.items():
        if cnt >= threshold:
            vocab.add_word(word)
    return vocab


def save_vocab(vocab: Vocabulary, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(vocab, f)


class _VocabUnpickler(pickle.Unpickler):
    """Accept pickles produced by the reference repo (module path
    ``ClassRepository.CaptionVocabClass``) as well as our own."""

    def find_class(self, module, name):  # noqa: D102
        if name in ("Caption_Vocabulary", "Vocabulary"):
            return Vocabulary
        return super().find_class(module, name)


def load_vocab(path: str) -> Vocabulary:
    with open(path, "rb") as f:
        return _VocabUnpickler(f).load()
