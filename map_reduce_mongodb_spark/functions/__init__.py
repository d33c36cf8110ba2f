from map_reduce_mongodb_spark.functions.scalar import falsy_coalesce

__all__ = ["falsy_coalesce"]
