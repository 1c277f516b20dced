"""ASR-BLEU scoring — the reference's end metric.

Equivalent of the reference scorer (SURVEY.md C16; reference
scripts/bleu_asr.py:1-83): hypotheses (ASR transcripts of generated
speech, ordered by wav index) are aligned to references through the TSV
``id`` column — order-robust via ``ref_list[ref_id_list[i] - 1]``
(bleu_asr.py:51) — both sides cleaned (english_cleaners), trailing
periods stripped, corpus BLEU via sacrebleu.
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

from mm_s2ut.eval.text_cleaner import english_cleaners


def clean_line(text: str) -> str:
    text = english_cleaners(text.strip())
    if text.endswith("."):
        text = text[:-1].strip()
    return text


def align_refs_by_id(
    refs: Sequence[str], ref_ids: Sequence[int]
) -> List[str]:
    """hyp i corresponds to refs[ref_ids[i] - 1] (1-based wav naming —
    the reference's filename-stem convention)."""
    return [refs[i - 1] for i in ref_ids]


def corpus_asr_bleu(
    hypotheses: Sequence[str],
    references: Sequence[str],
    clean: bool = True,
):
    """Returns the sacrebleu BLEU object (``.score`` is corpus BLEU)."""
    import sacrebleu

    if clean:
        hypotheses = [clean_line(h) for h in hypotheses]
        references = [clean_line(r) for r in references]
    return sacrebleu.corpus_bleu(list(hypotheses), [list(references)])


def score_from_files(
    transcript_file: str | Path,
    reference_file: str | Path,
    manifest_file: Optional[str | Path] = None,
):
    """File-level surface of the reference CLI: transcripts (one per wav,
    index order), references (one per line), optional TSV manifest whose
    ``id`` column re-aligns references to transcript order."""
    hyps = Path(transcript_file).read_text().splitlines()
    refs = Path(reference_file).read_text().splitlines()
    if manifest_file is not None:
        from mm_s2ut.data.manifest import read_manifest

        rows = read_manifest(manifest_file)
        # Reference convention: audio stems are 1-based line numbers into
        # the ref file (bleu_asr.py:51 — ref_list[ref_id_list[i] - 1]).
        stems = [int(Path(r.src_audio).stem) for r in rows]
        refs = align_refs_by_id(refs, stems)
    if len(hyps) != len(refs):
        raise ValueError(f"{len(hyps)} hyps vs {len(refs)} refs")
    return corpus_asr_bleu(hyps, refs)


def main():
    import argparse

    ap = argparse.ArgumentParser(description="ASR-BLEU (sacrebleu corpus BLEU)")
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--references", required=True)
    ap.add_argument("--manifest", default=None, help="TSV for id-based ref alignment")
    args = ap.parse_args()
    bleu = score_from_files(args.transcripts, args.references, args.manifest)
    print(f"BLEU Score: {bleu.score:.1f}")
    print(bleu)


if __name__ == "__main__":
    main()
