"""Fidelity report: deltas vs the torch reference across precision modes.

Prints, for every precision operating point, the max logit/probability
delta against the golden torch dump and the argmax agreement over all
shipped trials. Run on CPU for the f64 row (TPU cannot do c128 FFT):

  python tools/fidelity_report.py [--platform cpu|axon]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if jax.devices()[0].platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
    from neural_speech_decoding_tpu.io.dataset import load_trials
    from neural_speech_decoding_tpu.models.lstm import decoder_apply
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter

    golden_path = REPO_ROOT / "tests/golden/reference_probs.npz"
    with np.load(golden_path, allow_pickle=False) as z:
        golden = {k: z[k] for k in z.files}

    ds = load_trials()
    assert list(golden["files"]) == list(ds.files)
    params = jax.device_put(
        load_decoder_params(
            "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
            "lstm_classifier_Water_Food_Bg_Noise.pth"
        )
    )
    ref_logits = golden["logits"]
    ref_argmax = ref_logits.argmax(1)

    x64 = jax.config.read("jax_enable_x64")
    modes = [("fast f32", FilterConfig(precision="fast"), DecoderConfig())]
    if x64:
        modes.insert(0, ("fidelity f64", FilterConfig(precision="highest"), DecoderConfig()))
    modes.append((
        "turbo bf16",
        FilterConfig(precision="fast"),
        dataclasses.replace(DecoderConfig(), recurrence_dtype="bfloat16"),
    ))

    print(f"platform: {jax.devices()[0].platform} | trials: {len(ds)}")
    print(f"{'mode':14s} {'max|dlogit|':>12s} {'max|dprob|':>11s} {'argmax agree':>13s}")
    for name, fcfg, dcfg in modes:
        fn = jax.jit(
            lambda p, w, fcfg=fcfg, dcfg=dcfg: decoder_apply(
                p, jax.vmap(lambda a: mai_filter(a, fcfg))(w), dcfg
            )
        )
        logits = np.asarray(fn(params, ds.windows))
        probs = np.asarray(jax.nn.softmax(logits, -1))
        dl = np.abs(logits - ref_logits).max()
        dp = np.abs(probs - golden["probs"]).max()
        agree = float((logits.argmax(1) == ref_argmax).mean())
        print(f"{name:14s} {dl:12.2e} {dp:11.2e} {agree:13.4f}")


if __name__ == "__main__":
    main()
