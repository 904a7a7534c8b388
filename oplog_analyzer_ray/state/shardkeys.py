"""Shard-key metadata catalog (S4/J4 full contract).

The reference samples the source cluster's catalog: SampleCommand.java:452-475
reads ``config.collections`` (ns → shard-key doc + hashed flag) and writes
those docs into the sample output; AnalyzeCommand.java:289-306 reads them back
at analyze time and consults them for shard-key recommendations
(AnalyzeCommand.java:523-532).

The graft's corpus has no live catalog to query, so the catalog is the
deterministic function of the namespace universe the synthesizer guarantees:
even-numbered buckets are hashed on ``conv_id``; odd-numbered buckets are
range-sharded on ``(ts, conv_id)``.  ``config.*`` namespaces are unsharded
metadata and therefore absent — exactly the set ``config.collections`` would
list.  Being derivable from schema constants, the table is built driver-side
(it is the broadcast-small side everywhere it is used).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import NUM_BUCKETS, ROLE_CHANNELS


def shard_key_catalog() -> pa.Table:
    """(ns, key_fields, is_hashed) for every sharded namespace."""
    ns, keys, hashed = [], [], []
    for b in range(NUM_BUCKETS):
        for channel in sorted(ROLE_CHANNELS.values()):
            ns.append(f"bucket{b}.{channel}")
            if b % 2 == 0:
                keys.append("[conv_id]")
                hashed.append(True)
            else:
                keys.append("[ts, conv_id]")
                hashed.append(False)
    return pa.table(
        {
            "ns": pa.array(ns, pa.string()),
            "key_fields": pa.array(keys, pa.string()),
            "is_hashed": pa.array(hashed, pa.bool_()),
        }
    )


def shard_key_lookup() -> dict[str, dict]:
    """ns → {key_fields, is_hashed} (the AnalyzeCommand ``shardKeys`` map)."""
    t = shard_key_catalog()
    return {
        r["ns"]: {"key_fields": r["key_fields"], "is_hashed": r["is_hashed"]}
        for r in t.to_pylist()
    }
