from open_source_search_engine_spark.functions.tokenizer import tokens_col
from open_source_search_engine_spark.functions.hashing import term_id_col

__all__ = ["tokens_col", "term_id_col"]
