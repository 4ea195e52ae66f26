"""Multi-video batch entry (reference /root/reference/run.py:5-24).

Composes configs/default.yaml, builds the StreamList, runs a fresh pipeline
per video.  Videos can be sharded across hosts/chips with
``num_shards``/``shard_id`` overrides (the TPU-native "distributed backend"
for an annotation engine — per-chip independent pipelines, SURVEY.md §2.6),
and interleaved ``interleave``-at-a-time within one chip's process so the
device queue stays busy through each video's host-sync gaps
(vipe_tpu/parallel/interleave.py).
"""

import functools
import sys

from vipe_tpu.parallel.interleave import run_interleaved
from vipe_tpu.pipeline import make_pipeline
from vipe_tpu.streams.base import StreamList
from vipe_tpu.utils.config import compose, get_config_path
from vipe_tpu.utils.logging import get_logger


def main(overrides):
    logger = get_logger()
    cfg = compose(get_config_path(), "default", overrides)
    streams = StreamList.make(cfg["streams"])
    num_shards = int(cfg.get("num_shards", 1))
    shard_id = int(cfg.get("shard_id", 0))
    interleave = int(cfg.get("interleave", 1))

    def job(k, stream):
        pipeline = make_pipeline(cfg["pipeline"])
        if pipeline.should_filter(stream.name()):
            logger.info(f"skip existing: {stream.name()}")
            return
        logger.info(f"[{k + 1}/{len(streams)}] {stream.name()}")
        pipeline.run(stream.cache())

    jobs = [
        functools.partial(job, k, stream)
        for k, stream in enumerate(streams)
        if k % num_shards == shard_id
    ]
    run_interleaved(jobs, workers=interleave)


if __name__ == "__main__":
    main(sys.argv[1:])
