"""Vocabulary with fairseq-compatible special-token layout.

The reference's unit targets are encoded against a fairseq Dictionary whose
first four ids are ``<bos>=0, <pad>=1, <eos>=2, <unk>=3`` and whose unit
symbols "0".."999" therefore live at ids 4..1003 — the offset-4 semantics
that the unit packer depends on (reference
data/speech_to_speech_dataset.py:194-215,198-201; SURVEY.md F16). Lang tags
(``<lang:en>``) may be appended and used as bos/eos (reference
config/xm_transformer.yaml:4-7, data/speech_to_speech_dataset.py:280-283).
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import numpy as np


class Dictionary:
    def __init__(
        self,
        bos: str = "<s>",
        pad: str = "<pad>",
        eos: str = "</s>",
        unk: str = "<unk>",
    ):
        self.symbols: List[str] = []
        self.counts: List[int] = []
        self.indices: dict[str, int] = {}
        self.bos_word, self.pad_word, self.eos_word, self.unk_word = bos, pad, eos, unk
        self.bos_index = self.add_symbol(bos)
        self.pad_index = self.add_symbol(pad)
        self.eos_index = self.add_symbol(eos)
        self.unk_index = self.add_symbol(unk)
        self.nspecial = len(self.symbols)

    # -- construction ------------------------------------------------------

    def add_symbol(self, word: str, n: int = 1) -> int:
        if word in self.indices:
            idx = self.indices[word]
            self.counts[idx] += n
            return idx
        idx = len(self.symbols)
        self.indices[word] = idx
        self.symbols.append(word)
        self.counts.append(n)
        return idx

    @classmethod
    def load(cls, path: str | Path) -> "Dictionary":
        """Load a fairseq-format ``dict.txt`` (one "symbol count" per line)."""
        d = cls()
        for line in Path(path).read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            parts = line.rsplit(" ", 1)
            word = parts[0]
            count = int(parts[1]) if len(parts) == 2 and parts[1].lstrip("-").isdigit() else 1
            d.add_symbol(word, count)
        return d

    def save(self, path: str | Path) -> None:
        with open(path, "w") as f:
            for sym, cnt in zip(self.symbols[self.nspecial:], self.counts[self.nspecial:]):
                f.write(f"{sym} {cnt}\n")

    # -- accessors ----------------------------------------------------------

    def __len__(self) -> int:
        return len(self.symbols)

    def __getitem__(self, idx: int) -> str:
        return self.symbols[idx] if 0 <= idx < len(self.symbols) else self.unk_word

    def index(self, word: str) -> int:
        return self.indices.get(word, self.unk_index)

    def bos(self) -> int:
        return self.bos_index

    def pad(self) -> int:
        return self.pad_index

    def eos(self) -> int:
        return self.eos_index

    def unk(self) -> int:
        return self.unk_index

    # -- encode/decode -------------------------------------------------------

    def encode_line(
        self,
        line: str,
        append_eos: bool = True,
        add_if_not_exist: bool = False,
    ) -> np.ndarray:
        words = line.split()
        ids = [
            self.add_symbol(w) if add_if_not_exist else self.index(w) for w in words
        ]
        if append_eos:
            ids.append(self.eos_index)
        return np.asarray(ids, dtype=np.int32)

    def string(
        self,
        ids: Sequence[int],
        strip_special: bool = True,
    ) -> str:
        out = []
        special = {self.bos_index, self.pad_index, self.eos_index}
        for i in ids:
            i = int(i)
            if strip_special and i in special:
                continue
            out.append(self[i])
        return " ".join(out)


class UnitDictionary(Dictionary):
    """Dictionary over discrete acoustic units "0".."K-1".

    Matches the vocab produced by the reference's data prep
    (prep_s2ut_data.py over km1000 units — SURVEY.md C18): unit k has id
    k + 4.
    """

    def __init__(self, n_units: int = 1000, lang_tags: Optional[Iterable[str]] = None):
        super().__init__()
        self.n_units = n_units
        for k in range(n_units):
            self.add_symbol(str(k))
        self.lang_tags = {}
        for tag in lang_tags or ():
            self.lang_tags[tag] = self.add_symbol(tag)

    def units_to_ids(self, units: Sequence[int]) -> np.ndarray:
        """unit index -> vocab id (offset by nspecial=4)."""
        return np.asarray(units, dtype=np.int32) + self.nspecial

    def ids_to_units(self, ids: Sequence[int]) -> np.ndarray:
        """vocab id -> unit index, dropping specials/lang-tags."""
        ids = np.asarray(ids, dtype=np.int32)
        mask = (ids >= self.nspecial) & (ids < self.nspecial + self.n_units)
        return ids[mask] - self.nspecial

    def lang_tag_index(self, lang: str) -> int:
        tag = lang if lang.startswith("<lang:") else f"<lang:{lang}>"
        if tag not in self.lang_tags:
            raise KeyError(f"unknown lang tag {tag!r}")
        return self.lang_tags[tag]
