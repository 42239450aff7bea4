"""PsychoPy Builder `.psyexp` ingestion.

The reference ships its experiment definition as Builder XML
(reference: DataCollectionExperiment.psyexp:101-190): a SoundComponent
beep (0-0.5 s), a `$words` TextComponent cue (0.5 s + 4 s), a literal
"COOL OFF" TextComponent (4.5 s + 1.5 s), and a fullRandom loop whose
conditions are both inline (OrderedDict reprs) and in `words.csv`. Round 3
reproduced that schedule as a hand-written ExperimentConfig; this module
closes the loop by PARSING an existing .psyexp back into one, so a lab's
edited Builder file (different timings, different vocabulary) drives the
headless collector without transcription.

Only the stdlib XML parser is used; nothing here imports PsychoPy.
"""

from __future__ import annotations

import ast
import re
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Dict, List, Tuple

from neural_speech_decoding_tpu.collector.experiment import ExperimentConfig


def _params(component: ET.Element) -> Dict[str, str]:
    return {
        p.get("name"): p.get("val")
        for p in component.findall("Param")
        if p.get("name") is not None
    }


def _float(params: Dict[str, str], key: str, default: float) -> float:
    raw = (params.get(key) or "").strip()
    try:
        return float(raw)
    except ValueError:
        return default


def _loop_words(loop_params: Dict[str, str], psyexp_path: Path) -> Tuple[str, ...]:
    """Conditions from the sibling conditions file when it exists, else
    from the inline `conditions` repr (a list of OrderedDict reprs — the
    reference's words.csv is absent from its snapshot, so the inline copy
    is the recoverable source, SURVEY.md intro)."""
    cond_file = (loop_params.get("conditionsFile") or "").strip()
    if cond_file:
        cand = psyexp_path.parent / cond_file
        if cand.is_file():
            from neural_speech_decoding_tpu.collector.experiment import (
                load_words_csv,
            )

            try:
                return tuple(load_words_csv(cand))
            except ValueError:
                pass  # non-words conditions file; fall through to inline
    inline = loop_params.get("conditions") or ""
    words: List[str] = []
    # the val is a repr like "[OrderedDict([('words', 'water'), ...]), ...]"
    for match in re.finditer(r"OrderedDict\((\[.*?\])\)", inline):
        try:
            pairs = dict(ast.literal_eval(match.group(1)))
        except (ValueError, SyntaxError):
            continue
        if "words" in pairs:
            words.append(str(pairs["words"]))
    return tuple(words)


def load_psyexp(path) -> ExperimentConfig:
    """Parse a Builder .psyexp into the headless collector's
    ExperimentConfig: beep/word/cool-off timings from the trial routine's
    components, vocabulary + nReps from the trial loop.

    Identification is structural, not name-based: the beep is the first
    SoundComponent; the cue word is the TextComponent whose text is a
    `$variable`; the cool-off is the latest-starting literal
    TextComponent. Values missing from the XML keep ExperimentConfig
    defaults. Note the reference quirk: its Builder file says nReps=1 and
    the generated script overrides it with the string "10"
    (reference: Neural_decoding_data_collector.py:15,476) — this parser
    reports what the XML says; pass n_reps explicitly to reproduce a
    specific session length.
    """
    path = Path(path)
    root = ET.parse(path).getroot()

    beep = ExperimentConfig.beep_seconds
    word = ExperimentConfig.word_seconds
    cool = ExperimentConfig.cooloff_seconds
    word_start = None

    for sound in root.iter("SoundComponent"):
        p = _params(sound)
        if p.get("disabled") == "True":
            continue
        beep = _float(p, "stopVal", beep)
        break

    literal_texts = []
    for text in root.iter("TextComponent"):
        p = _params(text)
        if p.get("disabled") == "True":
            continue
        content = (p.get("text") or "").strip()
        if content.startswith("$"):
            word_start = _float(p, "startVal", beep)
            word = _float(p, "stopVal", word)
        else:
            literal_texts.append(p)
    if literal_texts:
        # cool-off = the literal text that starts last in the routine
        p = max(literal_texts, key=lambda q: _float(q, "startVal", 0.0))
        cool = _float(p, "stopVal", cool)

    n_reps = ExperimentConfig.n_reps
    words: Tuple[str, ...] = ()
    for loop in root.iter("LoopInitiator"):
        p = _params(loop)
        if p.get("isTrials") == "False":
            continue
        try:
            n_reps = int(float(p.get("nReps") or n_reps))
        except ValueError:
            pass
        words = _loop_words(p, path) or words
        break

    if word_start is not None and abs(word_start - beep) > 1e-9:
        # schedule with a gap between beep end and word onset: fold the
        # gap into the beep phase so trial_seconds stays faithful
        beep = word_start

    kwargs = dict(beep_seconds=beep, word_seconds=word, cooloff_seconds=cool,
                  n_reps=n_reps)
    if words:
        kwargs["words"] = words
    return ExperimentConfig(**kwargs)
