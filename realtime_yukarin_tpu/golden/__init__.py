from realtime_yukarin_tpu.golden import reference  # noqa: F401
