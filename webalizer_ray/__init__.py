"""webalizer_ray — a Ray-Data-native parse→enrich→route→aggregate engine.

A brand-new engine with the query/data-processing capabilities of
hyc/webalizer (The Webalizer 2.23.x), re-expressed over Parquet tables of
multi-turn conversation/agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Architecture (see SURVEY.md): ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, an actor pool for stateful
enrichment (the DNS/GeoIP-cache analog), sessionization as
``groupby(conv_id).map_groups`` (the ``put_hnode`` visit-timeout analog),
and per-sink Parquet outputs (the HTML/TSV report analogs), with
per-partition checkpoints replacing ``webalizer.current``.

Library code NEVER calls ``ray.init()`` / ``ray.shutdown()`` — sessions
are owned by bench.py, the CLI, and the pytest fixture only.
"""

from webalizer_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
