"""On-chip quality-regression replay (VERDICT r3 item 5).

Re-renders the COMMITTED baked evidence scene (runs/pipeline_tpu_256 —
the 256x256 5-stage pipeline run: scene.json + meshes + SH texture PNGs
are all in git) through the current BakedMeshRenderer and replays the
PSNR threshold stored in its results.json, so an on-chip rendering
regression fails the suite instead of living only in a JSON file.

Run on the TPU host:  VOLSURFS_TPU_TESTS=1 python -m pytest tests/ -m tpu
Skips cleanly on CPU (the conftest forces the cpu platform unless
VOLSURFS_TPU_TESTS=1) and when the committed assets are absent.

The training-stage thresholds (surf/offsets/volsurfs PSNR) are gated by
scripts/pipeline_run.py's own regression check at re-run time — their
checkpoints are too large to commit, so only the baked end product (the
paper's real-time path) is replayable from the repo alone.
"""

import json
import os

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_DIR = os.path.join(REPO, "runs", "pipeline_tpu_256")
SCENE_DIR = os.path.join(RUN_DIR, "volsurfs")


def _on_tpu() -> bool:
    return os.environ.get("VOLSURFS_TPU_TESTS") == "1" and any(
        d.platform != "cpu" for d in jax.devices()
    )


@pytest.mark.tpu
@pytest.mark.skipif(
    not _on_tpu(), reason="on-chip replay tier (VOLSURFS_TPU_TESTS=1 + TPU)"
)
@pytest.mark.skipif(
    not os.path.exists(os.path.join(SCENE_DIR, "scene.json")),
    reason="committed baked scene missing",
)
def test_baked_render_replays_committed_psnr():
    from volsurfs_tpu.datasets.mvdataset import MVDataset
    from volsurfs_tpu.renderers.mesh_renderer import BakedMeshRenderer
    from volsurfs_tpu.utils.evaluation import psnr

    with open(os.path.join(RUN_DIR, "results.json")) as f:
        committed = json.load(f)
    threshold = committed["baked_render_psnr"]

    # the synthetic scene is procedurally generated — same config as
    # scripts/pipeline_run.py --res 256 reproduces the exact GT images
    res = 256
    mv = MVDataset(
        "synthetic", "sphere", "",
        config={"width": res, "height": res,
                "nr_train_cameras": 24, "nr_test_cameras": 4},
    )
    renderer = BakedMeshRenderer(SCENE_DIR)
    test = mv["test"]
    # budget pre-pass like bench.py: with properly sized budgets no frame
    # may take an overflow-retry fallback (perf hygiene, asserted below)
    nr_cand, nr_blocks, nr_shade = renderer.suggest_budgets(test.cameras)
    psnrs = []
    for i, camera in enumerate(test.cameras):
        img = renderer.render_frame(
            camera, nr_cand=nr_cand, nr_blocks=nr_blocks,
            nr_shade_tiles=nr_shade,
        )
        gt = np.asarray(test.rgbs[i]).reshape(res, res, 3)
        psnrs.append(float(psnr(gt, np.asarray(img))))
    mean_psnr = float(np.mean(psnrs))
    assert sum(renderer.fallback_counts.values()) == 0, renderer.fallback_counts
    # re-rendering committed assets must reproduce the committed score; the
    # 0.3 dB band covers raster-vs-chunk determinism differences only
    assert mean_psnr > threshold - 0.3, (
        f"baked re-render {mean_psnr:.2f} dB vs committed {threshold} dB"
    )
