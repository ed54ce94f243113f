"""Dataset implementations + DSL registry."""

from fast3r_tpu.data.datasets.dummy_multiview import DummyMultiview  # noqa: F401
