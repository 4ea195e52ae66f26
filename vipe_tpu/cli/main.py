"""`vipe` CLI (reference /root/reference/vipe/cli/main.py:28-98):
``vipe infer VIDEO [--output ...] [--pipeline ...] [overrides...]`` and
``vipe visualize ARTIFACT_DIR``."""

from __future__ import annotations

import pathlib

import click

from ..utils.config import compose, get_config_path


@click.group()
def vipe():
    """TPU-native video annotation engine (poses, intrinsics, depth, masks)."""


@vipe.command()
@click.argument("video", type=click.Path(exists=True))
@click.option("--output", default="vipe_results", help="artifact output root")
@click.option("--pipeline", default="default", help="pipeline config name")
@click.option("--visualize", is_flag=True, help="save visualization video")
@click.argument("overrides", nargs=-1)
def infer(video, output, pipeline, visualize, overrides):
    """Annotate one mp4 (poses + intrinsics + depth + masks)."""
    from ..pipeline import make_pipeline
    from ..streams.raw_mp4_stream import RawMp4Stream
    from ..utils.logging import get_logger

    logger = get_logger()
    if not (get_config_path() / "pipeline" / f"{pipeline}.yaml").exists():
        known = sorted(
            p.stem for p in (get_config_path() / "pipeline").glob("*.yaml")
        )
        raise click.BadParameter(
            f"unknown pipeline {pipeline!r}; available: {', '.join(known)}"
        )
    cfg = compose(
        get_config_path(), "default",
        [f"pipeline={pipeline}"] + list(overrides),
    )
    pcfg = cfg["pipeline"]
    pcfg.setdefault("output", {})
    pcfg["output"]["path"] = output
    if visualize:
        pcfg["output"]["save_viz"] = True

    stream = RawMp4Stream(video).cache()
    pipe = make_pipeline(pcfg)
    if pipe.should_filter(stream.name()):
        logger.info(f"skipping {stream.name()} (exists)")
        return
    logger.info(f"running pipeline on {video}")
    pipe.run(stream)
    logger.info(f"artifacts saved under {output}")


@vipe.command()
@click.argument("artifact_dir", type=click.Path(exists=True))
@click.option("--port", default=8080)
@click.option("--serve", is_flag=True,
              help="interactive WebGL viewer (frustums + point clouds + "
                   "playback) instead of the static trajectory plot")
def visualize(artifact_dir, port, serve):
    """3D viewer over saved artifacts: --serve starts the interactive web
    app (reference viser.py behavior); default writes a static diagnostic
    PNG."""
    if serve:
        from ..utils.web_viewer import serve as serve_viewer

        serve_viewer(artifact_dir, port=port)
    else:
        from ..utils.viser import run_viser

        run_viser(artifact_dir, port=port)


@vipe.command()
@click.argument("artifact_dir", type=click.Path(exists=True))
@click.argument("gt_dir", type=click.Path(exists=True), required=False)
@click.option("--no-align", is_flag=True, help="skip Umeyama alignment")
@click.option("--save", is_flag=True,
              help="write eval/<name>_metrics.pkl + trajectory PNG")
def evaluate(artifact_dir, gt_dir, no_align, save):
    """Compare artifacts against ground-truth artifacts (ATE RMSE, depth
    abs-rel / rmse-log / δ1).  The reference ships the metric functions but
    leaves 'Add instructions for benchmarking' as a TODO (README.md:94);
    this closes that loop over the same artifact layout.

    GT_DIR may be omitted, in which case ground truth is read from the
    artifact tree's own ``eval/`` paths (``<name>_pose_gt.npz`` /
    ``<name>_depth_gt.zip``, the reference's eval_gt_* layout io.py:120-135).
    """
    import json
    import pickle

    import numpy as np

    from ..utils import io as io_utils
    from ..utils.geometry import (
        ate_rmse,
        depth_abs_relative_difference,
        depth_delta1_accuracy,
        depth_rmse_log,
        matrix_to_se3,
    )

    results = {}
    for art in io_utils.ArtifactPath.glob(artifact_dir):
        if gt_dir is not None:
            gt = io_utils.ArtifactPath(gt_dir, art.name)
            gt_pose_path, gt_depth_path = gt.pose_path, gt.depth_path
        else:
            gt_pose_path = art.eval_gt_pose_path
            gt_depth_path = art.eval_gt_depth_path
        if not gt_pose_path.exists():
            continue
        mats, _ = io_utils.read_pose_artifacts(art)
        z = np.load(gt_pose_path)
        gt_mats = z["data"]
        n = min(len(mats), len(gt_mats))
        entry = {
            "ate_rmse": ate_rmse(
                matrix_to_se3(mats[:n]), matrix_to_se3(gt_mats[:n]),
                align=not no_align,
            )
        }
        if art.depth_path.exists() and gt_depth_path.exists():
            absrel, rmselog, d1, count = 0.0, 0.0, 0.0, 0
            for pred, ref in zip(
                io_utils.read_depth_artifacts(art),
                io_utils.read_depth_zip(gt_depth_path),
            ):
                if pred.shape != ref.shape:
                    continue
                mask = (ref > 0) & (pred > 0) & np.isfinite(ref) & np.isfinite(pred)
                if mask.sum() < 16:
                    continue
                absrel += depth_abs_relative_difference(pred, ref, mask)
                rmselog += depth_rmse_log(pred, ref, mask)
                d1 += depth_delta1_accuracy(pred, ref, mask)
                count += 1
            if count:
                entry |= {
                    "depth_abs_rel": absrel / count,
                    "depth_rmse_log": rmselog / count,
                    "depth_delta1": d1 / count,
                }
        if save:
            art.eval_metrics_path.parent.mkdir(parents=True, exist_ok=True)
            with open(art.eval_metrics_path, "wb") as f:
                pickle.dump(entry, f)
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                from ..utils.geometry import align_trajectories

                pred = matrix_to_se3(mats[:n])
                ref = matrix_to_se3(gt_mats[:n])
                if not no_align:
                    pred, _ = align_trajectories(pred, ref)
                fig, ax = plt.subplots(figsize=(6, 6))
                ax.plot(ref[:, 0], ref[:, 2], "k--", label="gt")
                ax.plot(pred[:, 0], pred[:, 2], "b-", label="pred")
                ax.set_aspect("equal")
                ax.legend()
                ax.set_title(f"{art.name}  ATE {entry['ate_rmse']:.4f}")
                fig.savefig(art.eval_traj_vis_path, dpi=120,
                            bbox_inches="tight")
                plt.close(fig)
            except ImportError:
                pass
        results[art.name] = entry
    click.echo(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    vipe()
