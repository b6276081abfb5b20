"""Child process for the 2-process multihost test (run via subprocess).

Initializes JAX distributed from EVI_* env vars BEFORE any backend call,
then exercises a cross-process psum and ``gather_records``, writing results
as JSON to the path in argv[1].
"""

import json
import os
import sys


def main() -> None:
    out_path = sys.argv[1]
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from evi_rag_tpu.parallel.multihost import gather_records, initialize_distributed

    initialize_distributed()  # reads EVI_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    pid = jax.process_index()
    nproc = jax.process_count()

    # Real collective: psum over a global mesh spanning both processes.
    mesh = Mesh(np.array(jax.devices()), ("data",))
    local = np.full((jax.local_device_count(),), float(pid + 1), dtype=np.float32)
    arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local)
    summed = shard_map(
        lambda x: jax.lax.psum(x, "data"), mesh=mesh, in_specs=P("data"), out_specs=P()
    )(arr)
    psum_val = float(np.asarray(jax.device_get(summed.addressable_data(0)))[0])

    # Record merge with dedup (both processes contribute id=0; last wins).
    merged = gather_records(
        [{"id": 0, "v": f"p{pid}"}, {"id": pid + 1, "v": f"own{pid}"}],
        dedup_key=lambda r: r["id"],
    )

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_index": pid,
                "process_count": nproc,
                "psum": psum_val,
                "merged_ids": sorted(r["id"] for r in merged),
            },
            f,
        )


if __name__ == "__main__":
    main()
