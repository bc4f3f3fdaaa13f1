from ctr_recommendation_tpu.data.item_store import ItemStore
from ctr_recommendation_tpu.data.parquet import TableData, iter_batches, load_split
from ctr_recommendation_tpu.data.synthetic import (
    make_synthetic_tables,
    write_synthetic_dataset,
)

__all__ = [
    "ItemStore",
    "TableData",
    "iter_batches",
    "load_split",
    "make_synthetic_tables",
    "write_synthetic_dataset",
]
