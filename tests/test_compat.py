"""Reference-style import surface (the syconn alias package)."""


def test_reference_imports():
    from syconn import global_params  # noqa: F401
    from syconn.backend.storage import AttributeDict, CompressedStorage  # noqa: F401
    from syconn.exec import exec_init, exec_syns  # noqa: F401
    from syconn.extraction.cs_processing_steps import combine_and_split_syn  # noqa: F401
    from syconn.extraction.find_object_properties import detect_cs  # noqa: F401
    from syconn.handler.basics import chunkify, kd_factory  # noqa: F401
    from syconn.handler.config import generate_default_conf  # noqa: F401
    from syconn.mp.batchjob_utils import batchjob_enabled, batchjob_script  # noqa: F401
    from syconn.mp.mp_utils import start_multiprocess_imap  # noqa: F401
    from syconn.proc.stats import FileTimer  # noqa: F401
    from syconn.reps.segmentation import SegmentationDataset, SegmentationObject  # noqa: F401
    from syconn.reps.super_segmentation import SuperSegmentationDataset  # noqa: F401
    from syconn.reps.super_segmentation_object import SuperSegmentationObject  # noqa: F401

    assert not batchjob_enabled()


def test_alias_is_same_module():
    import syconn.reps.segmentation as a
    import syconn_tpu.reps.segmentation as b

    assert a is b
