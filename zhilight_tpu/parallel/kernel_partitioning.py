"""Process-wide switch: route Pallas kernels through their SPMD-partitioned
wrappers (ops/pallas/partitioned.py). The engine turns this on when its mesh
spans more than one device; on a single device the plain kernels keep their
leaner custom-call (and its in-place pool aliasing) without an SPMD
partitioning boundary around it."""

_ENABLED = False


def enable_kernel_partitioning(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def kernel_partitioning_enabled() -> bool:
    return _ENABLED
