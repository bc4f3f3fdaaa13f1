from ctr_recommendation_tpu.data.device_store import DeviceItemStore
from ctr_recommendation_tpu.data.item_store import ItemStore
from ctr_recommendation_tpu.data.parquet import TableData, iter_batches, load_split
from ctr_recommendation_tpu.data.prefetch import prefetch
from ctr_recommendation_tpu.data.streaming import stream_batches
from ctr_recommendation_tpu.data.synthetic import (
    make_synthetic_tables,
    write_synthetic_dataset,
)

__all__ = [
    "DeviceItemStore",
    "ItemStore",
    "TableData",
    "iter_batches",
    "load_split",
    "make_synthetic_tables",
    "prefetch",
    "stream_batches",
    "write_synthetic_dataset",
]
