from qpwcnet_tpu.data.flo_format import read_flo, write_flo
from qpwcnet_tpu.data.pfm import read_pfm
from qpwcnet_tpu.data.tfrecord import (
    tfrecord_iterator,
    write_tfrecord,
    parse_sintel_example,
    make_sintel_example,
)
from qpwcnet_tpu.data.triplet import (
    TripletDataset,
    VimeoTriplet,
    YoutubeVos,
    DummyTripletDataset,
)

__all__ = [
    "read_flo",
    "write_flo",
    "read_pfm",
    "tfrecord_iterator",
    "write_tfrecord",
    "parse_sintel_example",
    "make_sintel_example",
    "TripletDataset",
    "VimeoTriplet",
    "YoutubeVos",
    "DummyTripletDataset",
]
