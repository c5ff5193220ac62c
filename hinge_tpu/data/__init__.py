from hinge_tpu.data.overlaps import OverlapStore, ReadStore  # noqa: F401
