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
def visualize(artifact_dir, port):
    """Interactive 3D viewer over saved artifacts (viser-based when
    available; falls back to matplotlib trajectory plots)."""
    from ..utils.viser import run_viser

    run_viser(artifact_dir, port=port)


if __name__ == "__main__":
    vipe()
