from siss_tpu.ops.siss_pallas import siss_weighted_sums, siss_weighted_sums_reference

__all__ = ["siss_weighted_sums", "siss_weighted_sums_reference"]
