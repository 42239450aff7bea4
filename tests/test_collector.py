"""Collector chain + headless experiment tests."""

import time
from collections import Counter

import numpy as np
import pytest

from neural_speech_decoding_tpu.collector.chain import (
    preprocess_trial,
    record_trial,
    write_trial_csv,
)
from neural_speech_decoding_tpu.collector.experiment import (
    ExperimentConfig,
    full_random_order,
    run_experiment,
)
from neural_speech_decoding_tpu.io.dataset import load_trials
from neural_speech_decoding_tpu.runtime.board import SyntheticBoard


def test_preprocess_trial_format():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((625, 8)) * 10 + 3
    out = preprocess_trial(raw)
    assert out.shape == (625, 8)
    # rounded to 7 decimals
    np.testing.assert_array_equal(out, np.round(out, 7))
    # no negative zeros survive
    assert not np.any((out == 0.0) & np.signbit(out))
    # detrended: means near zero
    assert np.abs(out.mean(axis=0)).max() < 0.5


def test_write_trial_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    data = np.round(rng.standard_normal((625, 8)), 7)
    path = tmp_path / "food_test.csv"
    write_trial_csv(path, data)
    text = path.read_text().strip().split("\n")
    assert len(text) == 625
    assert len(text[0].split(",")) == 8
    back = np.loadtxt(path, delimiter=",")
    np.testing.assert_allclose(back, data, atol=1e-7)


def test_record_trial_from_board(tmp_path):
    board = SyntheticBoard(speed=64.0)
    board.prepare_session()
    board.start_stream(5000)
    try:
        deadline = time.time() + 10
        while board.get_board_data_count() < 625 and time.time() < deadline:
            time.sleep(0.01)
        path = record_trial(board, "water", tmp_path)
    finally:
        board.stop_stream()
        board.release_session()
    assert path is not None
    assert path.name.startswith("water_")
    # written trial is loadable by the dataset loader
    ds = load_trials(tmp_path, class_prefixes=("food", "water"))
    assert ds.windows.shape == (1, 625, 8)
    assert ds.labels[0] == 1


def test_full_random_order_is_balanced_permutation():
    cfg = ExperimentConfig(n_reps=5, seed=3)
    order = full_random_order(cfg)
    assert len(order) == 20
    assert Counter(order) == {w: 5 for w in cfg.words}
    assert order != full_random_order(ExperimentConfig(n_reps=5, seed=4))


def test_run_experiment_headless(tmp_path):
    board = SyntheticBoard(speed=256.0)
    board.prepare_session()
    board.start_stream(20000)
    seen = []
    try:
        cfg = ExperimentConfig(n_reps=1, warmup_seconds=0.0, seed=0)
        paths = run_experiment(
            board, tmp_path, cfg,
            on_trial=lambda i, w, p: seen.append((i, w)),
        )
    finally:
        board.stop_stream()
        board.release_session()
    assert len(paths) == 4  # 4 words x 1 rep
    assert len(seen) == 4
    ds = load_trials(tmp_path, class_prefixes=("food", "water", "yes", "no"))
    assert ds.windows.shape == (4, 625, 8)
    # the written text uses the reference's "%.7f" format
    first_line = paths[0].read_text().split("\n", 1)[0]
    for tok in first_line.split(","):
        assert len(tok.split(".")[1]) == 7, tok


def test_load_words_csv(tmp_path):
    from neural_speech_decoding_tpu.collector.experiment import load_words_csv

    p = tmp_path / "words.csv"
    p.write_text("words\nwater\nfood\nyes\nno\n")
    assert load_words_csv(p) == ("water", "food", "yes", "no")
    bad = tmp_path / "bad.csv"
    bad.write_text("nope\nx\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="words"):
        load_words_csv(bad)


def test_repo_words_csv():
    from pathlib import Path

    from neural_speech_decoding_tpu.collector.experiment import load_words_csv

    root = Path(__file__).resolve().parents[1]
    assert load_words_csv(root / "words.csv") == ("water", "food", "yes", "no")


def _native_lib_or_skip():
    import subprocess
    from pathlib import Path

    from neural_speech_decoding_tpu.runtime import native

    root = Path(__file__).resolve().parents[1]
    if not (root / "native" / "build" / "libnsdboard.so").is_file():
        try:
            subprocess.run(
                ["make", "-C", str(root / "native")],
                check=True,
                capture_output=True,
            )
        except Exception as e:  # pragma: no cover
            pytest.skip(f"cannot build native lib: {e}")
    if native.load_library() is None:
        pytest.skip("native lib not loadable")
    return native


def test_collector_chain_matches_native_dsp():
    """The JAX collector chain and the C++ DSP (native/nsd_dsp.cpp) are two
    independent renderings of BrainFlow's detrend + pad-free zero-phase
    Butterworth chain — drive the same real window through both and demand
    f64 agreement. This pins the padtype=None default to the oracle the
    repo itself ships."""
    native = _native_lib_or_skip()
    from neural_speech_decoding_tpu.ops.iir import _COLLECTOR_STAGES, butter_sos

    ds = load_trials()
    w = ds.windows[7].astype(np.float64)  # [T, C]

    ours = np.asarray(preprocess_trial(w, fs=125.0))  # default pad-free

    x_ct = w.T.copy()  # native DSP works along the last axis
    x_ct = native.native_detrend_constant(x_ct)
    for kind, order, lo, hi in _COLLECTOR_STAGES:
        sos = np.asarray(butter_sos(kind, order, lo, hi, 125.0))
        x_ct = native.native_sosfilt(x_ct, sos, zero_phase=True)
    theirs = x_ct.T
    theirs = np.round(theirs, decimals=7)
    theirs[theirs == 0.0] = 0.0

    np.testing.assert_allclose(ours, theirs, rtol=0, atol=2e-7)
    # and the scipy-padded variant must NOT match at the edges (regression
    # guard: the old default silently differed from the BrainFlow chain)
    padded = np.asarray(preprocess_trial(w, fs=125.0, padtype="odd"))
    assert np.abs(padded - theirs).max() > 1e-4


def test_stimulus_presenter_session(tmp_path):
    """Full session with the terminal presenter on an accelerated board:
    beep/word/cool-off calls in trial order, ANSI output produced, and all
    trials written (reference protocol: collector :543-681)."""
    import io

    from neural_speech_decoding_tpu.collector.stimulus import TerminalPresenter

    out = io.StringIO()
    presenter = TerminalPresenter(out=out, listen_keys=False)
    board = SyntheticBoard(speed=256.0)
    board.prepare_session()
    board.start_stream(5000)
    try:
        cfg = ExperimentConfig(words=("water", "food"), n_reps=1, seed=1)
        paths = run_experiment(board, tmp_path, cfg, presenter=presenter)
    finally:
        presenter.close()
        board.stop_stream()
        board.release_session()
    assert len(paths) == 2
    text = out.getvalue()
    assert "\a" in text  # beep
    assert "WATER" in text and "FOOD" in text
    assert "COOL OFF" in text
    assert "(ESC or q to abort)" in text


def test_stimulus_abort_keeps_partial_data(tmp_path):
    """Abort after the first trial: the session ends early and keeps the
    trials written so far (reference escape semantics)."""
    import io

    from neural_speech_decoding_tpu.collector.stimulus import TerminalPresenter

    presenter = TerminalPresenter(out=io.StringIO(), listen_keys=False)
    board = SyntheticBoard(speed=256.0)
    board.prepare_session()
    board.start_stream(5000)

    def abort_after_first(i, word, path):
        presenter.request_abort()

    try:
        cfg = ExperimentConfig(words=("water", "food", "yes"), n_reps=2, seed=0)
        paths = run_experiment(
            board, tmp_path, cfg, presenter=presenter, on_trial=abort_after_first
        )
    finally:
        presenter.close()
        board.stop_stream()
        board.release_session()
    assert len(paths) == 1
    assert len(list(tmp_path.glob("*.csv"))) == 1


def test_psyexp_ingestion_recovers_reference_schedule():
    """Parsing the reference's own Builder XML recovers the exact trial
    schedule and vocabulary (reference: DataCollectionExperiment.psyexp:
    101-190 — beep 0.5 s, word 4 s, cool-off 1.5 s, words
    water/food/yes/no; its words.csv is absent from the snapshot so the
    inline conditions are the source)."""
    from pathlib import Path

    import pytest

    from neural_speech_decoding_tpu.collector.psyexp import load_psyexp

    ref = Path("/root/reference/DataCollectionExperiment.psyexp")
    if not ref.is_file():
        pytest.skip("reference .psyexp not mounted")
    cfg = load_psyexp(ref)
    assert cfg.beep_seconds == 0.5
    assert cfg.word_seconds == 4.0
    assert cfg.cooloff_seconds == 1.5
    assert cfg.trial_seconds == 6.0
    assert cfg.words == ("water", "food", "yes", "no")
    # the XML itself says nReps=1 (the generated script overrides it with
    # the string "10" — SURVEY.md §7 fidelity trap); the parser reports
    # what the XML says
    assert cfg.n_reps == 1


def test_psyexp_ingestion_custom_timings(tmp_path):
    """An edited Builder file (new timings, new vocabulary, conditions
    file next to it) round-trips into ExperimentConfig."""
    from neural_speech_decoding_tpu.collector.psyexp import load_psyexp

    (tmp_path / "conds.csv").write_text("words\nleft\nright\n")
    (tmp_path / "exp.psyexp").write_text("""<?xml version="1.0" ?>
<PsychoPy2experiment version="2025.1.1" encoding="utf-8">
  <Routines>
    <Routine name="trial">
      <SoundComponent name="beep">
        <Param val="0.3" valType="code" name="stopVal"/>
        <Param val="0.0" valType="code" name="startVal"/>
      </SoundComponent>
      <TextComponent name="cue">
        <Param val="$words" valType="str" name="text"/>
        <Param val="0.3" valType="code" name="startVal"/>
        <Param val="2.5" valType="code" name="stopVal"/>
      </TextComponent>
      <TextComponent name="rest">
        <Param val="REST" valType="str" name="text"/>
        <Param val="2.8" valType="code" name="startVal"/>
        <Param val="1.0" valType="code" name="stopVal"/>
      </TextComponent>
    </Routine>
  </Routines>
  <Flow>
    <LoopInitiator loopType="TrialHandler" name="trials">
      <Param name="conditionsFile" val="conds.csv" valType="file"/>
      <Param name="isTrials" val="True" valType="bool"/>
      <Param name="nReps" val="6" valType="num"/>
    </LoopInitiator>
  </Flow>
</PsychoPy2experiment>
""")
    cfg = load_psyexp(tmp_path / "exp.psyexp")
    assert cfg.beep_seconds == 0.3
    assert cfg.word_seconds == 2.5
    assert cfg.cooloff_seconds == 1.0
    assert cfg.words == ("left", "right")
    assert cfg.n_reps == 6


def test_psyexp_scopes_to_trial_routine(tmp_path):
    """Components in welcome/feedback routines OUTSIDE the trials loop
    must not hijack the trial timings: the welcome routine's attention
    beep (1.0 s) and the feedback routine's $msg text are ignored; only
    the looped trial routine contributes. The loop's `random seed` is
    also recovered."""
    from neural_speech_decoding_tpu.collector.psyexp import load_psyexp

    (tmp_path / "exp.psyexp").write_text("""<?xml version="1.0" ?>
<PsychoPy2experiment version="2025.1.1" encoding="utf-8">
  <Routines>
    <Routine name="welcome">
      <SoundComponent name="attention">
        <Param val="1.0" valType="code" name="stopVal"/>
        <Param val="0.0" valType="code" name="startVal"/>
      </SoundComponent>
    </Routine>
    <Routine name="trial">
      <SoundComponent name="beep">
        <Param val="0.4" valType="code" name="stopVal"/>
        <Param val="0.0" valType="code" name="startVal"/>
      </SoundComponent>
      <TextComponent name="cue">
        <Param val="$words" valType="str" name="text"/>
        <Param val="0.4" valType="code" name="startVal"/>
        <Param val="3.0" valType="code" name="stopVal"/>
      </TextComponent>
      <TextComponent name="rest">
        <Param val="REST" valType="str" name="text"/>
        <Param val="3.4" valType="code" name="startVal"/>
        <Param val="1.2" valType="code" name="stopVal"/>
      </TextComponent>
    </Routine>
    <Routine name="feedback">
      <TextComponent name="msg">
        <Param val="$msg" valType="str" name="text"/>
        <Param val="0.0" valType="code" name="startVal"/>
        <Param val="9.0" valType="code" name="stopVal"/>
      </TextComponent>
      <TextComponent name="bye">
        <Param val="BYE" valType="str" name="text"/>
        <Param val="8.0" valType="code" name="startVal"/>
        <Param val="5.0" valType="code" name="stopVal"/>
      </TextComponent>
    </Routine>
  </Routines>
  <Flow>
    <Routine name="welcome"/>
    <LoopInitiator loopType="TrialHandler" name="trials">
      <Param name="isTrials" val="True" valType="bool"/>
      <Param name="nReps" val="4" valType="num"/>
      <Param name="random seed" val="7" valType="code"/>
    </LoopInitiator>
    <Routine name="trial"/>
    <LoopTerminator name="trials"/>
    <Routine name="feedback"/>
  </Flow>
</PsychoPy2experiment>
""")
    cfg = load_psyexp(tmp_path / "exp.psyexp")
    assert cfg.beep_seconds == 0.4   # not the welcome routine's 1.0
    assert cfg.word_seconds == 3.0   # not the feedback routine's 9.0
    assert cfg.cooloff_seconds == 1.2  # not BYE's 5.0
    assert cfg.n_reps == 4
    assert cfg.seed == 7


def test_psyexp_stoptype_time_seconds(tmp_path):
    """Builder's stopType 'time (s)' means ABSOLUTE routine-relative end
    time, not duration: cue start 0.5 / stop 4.5 is a 4.0 s word phase."""
    from neural_speech_decoding_tpu.collector.psyexp import load_psyexp

    (tmp_path / "exp.psyexp").write_text("""<?xml version="1.0" ?>
<PsychoPy2experiment version="2025.1.1" encoding="utf-8">
  <Routines>
    <Routine name="trial">
      <SoundComponent name="beep">
        <Param val="time (s)" valType="str" name="stopType"/>
        <Param val="0.5" valType="code" name="stopVal"/>
        <Param val="0.0" valType="code" name="startVal"/>
      </SoundComponent>
      <TextComponent name="cue">
        <Param val="$words" valType="str" name="text"/>
        <Param val="time (s)" valType="str" name="stopType"/>
        <Param val="0.5" valType="code" name="startVal"/>
        <Param val="4.5" valType="code" name="stopVal"/>
      </TextComponent>
      <TextComponent name="rest">
        <Param val="COOL OFF" valType="str" name="text"/>
        <Param val="time (s)" valType="str" name="stopType"/>
        <Param val="4.5" valType="code" name="startVal"/>
        <Param val="6.0" valType="code" name="stopVal"/>
      </TextComponent>
    </Routine>
  </Routines>
  <Flow>
    <LoopInitiator loopType="TrialHandler" name="trials">
      <Param name="isTrials" val="True" valType="bool"/>
      <Param name="nReps" val="10" valType="num"/>
    </LoopInitiator>
    <Routine name="trial"/>
    <LoopTerminator name="trials"/>
  </Flow>
</PsychoPy2experiment>
""")
    cfg = load_psyexp(tmp_path / "exp.psyexp")
    assert cfg.beep_seconds == 0.5
    assert cfg.word_seconds == 4.0   # 4.5 end - 0.5 start, NOT 4.5
    assert cfg.cooloff_seconds == 1.5
    assert cfg.trial_seconds == 6.0
