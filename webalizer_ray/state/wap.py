"""Write–Audit–Publish: no unvalidated bytes ever become visible.

The production discipline behind every trustworthy feed (popularized
by Netflix's Iceberg WAP pattern): a writer never writes into the
serving location. It (1) WRITES the batch to an isolated staging
directory, (2) AUDITS the staged files with the data-contract gate
(stages/textstats.py:validate_rules — null/range/regex/unique checks
as one streaming pass over the STAGED data, so the audit sees exactly
the bytes readers would), and (3) PUBLISHES by an atomic directory
rename only if every rule passed. A failed audit leaves the serving
directory byte-untouched and the staging directory in place under
``<out>.quarantine-*`` for debugging — failure is loud, partial
visibility is impossible.

Readers see either the complete old state or the complete new state,
never a torn write: the publish is ONE ``os.replace`` of a directory
name. (On a shared store the same two-phase layout applies: stage
under a job-unique prefix, flip a manifest/symlink as the commit.)

Scale shape: the write is an ordinary distributed ``write_parquet``;
the audit is the existing one-pass partial-count gate; the publish is
O(1) metadata.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

import ray.data as rd

from webalizer_ray.stages.textstats import validate_rules


class AuditFailure(RuntimeError):
    """Raised when a staged batch violates its contract; carries the
    per-rule violation table and the quarantine path."""

    def __init__(self, report: pd.DataFrame, quarantine: str):
        self.report = report
        self.quarantine = quarantine
        bad = report[report["violations"] > 0]
        super().__init__(
            "audit failed: "
            + "; ".join(f"{r.column}.{r.rule}={r.violations}"
                        for r in bad.itertuples())
            + f" (staged data quarantined at {quarantine})")


def write_audit_publish(ds: rd.Dataset, out_dir: str,
                        rules: dict) -> pd.DataFrame:
    """Stage ``ds`` next to ``out_dir``, audit the STAGED files against
    ``rules``, atomically publish on pass. Returns the audit report
    (one row per rule). Raises :class:`AuditFailure` on violation —
    the serving directory is left exactly as it was."""
    staging = f"{out_dir}.staging-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)
    ds.write_parquet(staging)

    report = validate_rules(rd.read_parquet(staging), rules)
    if int(report["violations"].sum()) > 0:
        quarantine = f"{out_dir}.quarantine-{os.getpid()}"
        shutil.rmtree(quarantine, ignore_errors=True)
        os.replace(staging, quarantine)
        raise AuditFailure(report, quarantine)

    old = f"{out_dir}.old-{os.getpid()}"
    if os.path.isdir(out_dir):
        os.replace(out_dir, old)
    os.replace(staging, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return report
