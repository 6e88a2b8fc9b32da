"""Test config: run on CPU with 8 virtual devices so TP/EP/mesh/scheduler
logic is testable without TPU hardware (the capability the reference lacks —
its tests all require real GPUs, SURVEY.md §4). Set ZT_TEST_TPU=1 to run the
suite against the real accelerator instead."""

import os

if not os.environ.get("ZT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

if not os.environ.get("ZT_TEST_TPU"):
    # the axon sitecustomize registers the TPU plugin and pins
    # jax_platforms before user code runs; env vars alone don't override it
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
