"""Multi-granule pod-scale training: G granules trained concurrently, each
on its own device group.

Each HARP2 granule defines its own scene frame (normalization scale/offset,
lat/lon bounds, ``max_i``) which the pipeline closure-captures as
compile-time constants, and granules are physically independent scenes — so
the TPU-native multi-granule design is *granule parallelism*, not one shared
model: partition the pod's chips into G groups, give every granule its own
dataset/pipeline/Trainer compiled against a mesh over its group, and
round-robin the trainers' step generators. JAX dispatch is asynchronous, so
step g+1 is enqueued while step g still runs — steps on disjoint devices
execute concurrently, and the only serialization points are each trainer's
own periodic loss fetches. Within a group, rays still shard over that
sub-mesh's ``data`` axis with gradient all-reduce over ICI (the single-model
path, ``parallel/``); this module adds the across-granule axis the
reference lacks entirely (BASELINE.json "Multi-granule pod-scale training";
reference scripts/train.py:94 is single-GPU, single-granule).
"""

from __future__ import annotations

from pathlib import Path

import jax


def partition_devices(n_granules: int, devices=None) -> list[list]:
    """Split the visible devices into ``n_granules`` contiguous groups.

    Contiguity keeps each group's chips ICI-adjacent in the default device
    enumeration so intra-granule gradient all-reduce never crosses group
    boundaries. With fewer devices than granules, groups share devices
    round-robin (correct — the runtime serializes their steps — just not
    concurrent)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n < n_granules:
        return [[devices[g % n]] for g in range(n_granules)]
    per = n // n_granules
    return [devices[g * per : (g + 1) * per] for g in range(n_granules)]


def _tagged_print(tag: str, *args, **kwargs) -> None:
    # the single-granule console line rewrites itself with end="\r";
    # interleaved trainers each get a prefixed, newline-terminated line
    kwargs.pop("end", None)
    text = " ".join(str(a) for a in args).rstrip()
    if text:
        print(f"[{tag}] {text}")
    else:
        print()


def train_granules(
    trainers: list,
    output_paths: list[str | Path],
    profile: bool = False,
) -> None:
    """Drive G trainers' step generators round-robin until all finish.

    SIGTERM preemption is installed once and fans out to every trainer, so
    a pod maintenance event checkpoints *all* granules before returning
    (each via its own preemption path)."""
    assert len(trainers) == len(output_paths)
    import signal

    def _on_sigterm(signum, frame):
        for t in trainers:
            t._preempted = True

    signal.signal(signal.SIGTERM, _on_sigterm)

    for g, t in enumerate(trainers):
        if jax.process_index() == 0:
            t._print = lambda *a, _g=g, **k: _tagged_print(f"granule {_g}", *a, **k)

    gens = [
        t.iterate(p, profile=profile and g == 0)
        for g, (t, p) in enumerate(zip(trainers, output_paths))
    ]
    active = list(gens)
    try:
        while active:
            for gen in list(active):
                try:
                    next(gen)
                except StopIteration:
                    active.remove(gen)
    finally:
        # one granule failing (checkify error, OOM) must not leave the
        # healthy granules' in-flight async checkpoint saves non-durable:
        # close the surviving generators (runs their epoch-save epilogue's
        # finally blocks) and block on every trainer's checkpoint manager
        for gen in active:
            gen.close()
        for t in trainers:
            t._ckpt_mgr.wait()
