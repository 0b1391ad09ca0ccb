"""Multi-process container assembly (SURVEY.md §5 'distributed
communication backend').

Spawns a real 2-process jax.distributed CPU cluster (2 virtual devices
per process = a 4-device global mesh); each process owns half the
streams, and container assembly gathers the variable-length compressed
streams in global order via multihost_utils.process_allgather
(sharding._host_gather). The container bytes must equal the
single-process result exactly -- the byte-level determinism the
reference gets for free from being single-threaded.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4
from density_tpu import container
data = (b"multihost ordered gather determinism check " * 700)[:30000]
blob = container.compress(data, "chameleon", stream_size=1 << 12)
rt = container.decompress(blob)
assert rt == data, "multihost round-trip"
with open(os.path.join(outdir, f"blob{pid}"), "wb") as f:
    f.write(blob)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_container_matches_single(tmp_path):
    port = _free_port()
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR": ""}
    # the axon TPU plugin registers itself (ahead of CPU) whenever
    # PALLAS_AXON_POOL_IPS is set, and a 2-process cluster must not
    # fight over the single tunneled chip -- run workers CPU-only
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(port),
         str(tmp_path)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE) for pid in range(2)]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    blob0 = (tmp_path / "blob0").read_bytes()
    blob1 = (tmp_path / "blob1").read_bytes()
    assert blob0 == blob1, "all hosts assemble identical containers"

    # single-process result must be byte-identical
    from density_tpu import container
    data = (b"multihost ordered gather determinism check " * 700)[:30000]
    single = container.compress(data, "chameleon", stream_size=1 << 12)
    assert blob0 == single
