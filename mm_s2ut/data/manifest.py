"""TSV manifest reader/writer — the reference's public data surface.

Schema (mandatory columns, reference data/speech_to_speech_dataset.py:526-531):
``id, src_audio, src_n_frames, tgt_text, tgt_n_frames`` with optional
``src_lang, tgt_lang``; ``tgt_text`` holds the space-separated unit string
for S2UT (target_is_code) or a target audio path otherwise. Produced by the
prep pipeline (reference scripts/preprocess/5_prep_s2ut_data.sh).
"""
from __future__ import annotations

import csv
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

KEY_ID = "id"
KEY_SRC_AUDIO = "src_audio"
KEY_SRC_N_FRAMES = "src_n_frames"
KEY_TGT_AUDIO = "tgt_text"
KEY_TGT_N_FRAMES = "tgt_n_frames"
KEY_SRC_LANG = "src_lang"
KEY_TGT_LANG = "tgt_lang"
DEFAULT_LANG = ""

MANDATORY = (KEY_ID, KEY_SRC_AUDIO, KEY_SRC_N_FRAMES, KEY_TGT_AUDIO, KEY_TGT_N_FRAMES)


@dataclass
class ManifestRow:
    id: str
    src_audio: str
    src_n_frames: int
    tgt_text: str
    tgt_n_frames: int
    src_lang: str = DEFAULT_LANG
    tgt_lang: str = DEFAULT_LANG
    extra: Dict[str, str] = field(default_factory=dict)


def read_manifest(path: str | Path) -> List[ManifestRow]:
    rows: List[ManifestRow] = []
    with open(path, newline="") as f:
        reader = csv.DictReader(
            f, delimiter="\t", quotechar=None, quoting=csv.QUOTE_NONE,
            doublequote=False, lineterminator="\n", escapechar="\\",
        )
        if reader.fieldnames is None:
            return rows
        missing = [k for k in MANDATORY if k not in reader.fieldnames]
        if missing:
            raise ValueError(f"manifest {path} missing columns {missing}")
        for rec in reader:
            rows.append(
                ManifestRow(
                    id=rec[KEY_ID],
                    src_audio=rec[KEY_SRC_AUDIO],
                    src_n_frames=int(rec[KEY_SRC_N_FRAMES]),
                    tgt_text=rec[KEY_TGT_AUDIO],
                    tgt_n_frames=int(rec[KEY_TGT_N_FRAMES]),
                    src_lang=rec.get(KEY_SRC_LANG, DEFAULT_LANG) or DEFAULT_LANG,
                    tgt_lang=rec.get(KEY_TGT_LANG, DEFAULT_LANG) or DEFAULT_LANG,
                    extra={
                        k: v for k, v in rec.items()
                        if k not in (*MANDATORY, KEY_SRC_LANG, KEY_TGT_LANG)
                    },
                )
            )
    return rows


def write_manifest(path: str | Path, rows: List[ManifestRow]) -> None:
    has_lang = any(r.src_lang or r.tgt_lang for r in rows)
    fields = list(MANDATORY) + ([KEY_SRC_LANG, KEY_TGT_LANG] if has_lang else [])
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t", lineterminator="\n")
        w.writerow(fields)
        for r in rows:
            rec = [r.id, r.src_audio, r.src_n_frames, r.tgt_text, r.tgt_n_frames]
            if has_lang:
                rec += [r.src_lang, r.tgt_lang]
            w.writerow(rec)
