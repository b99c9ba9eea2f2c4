import amof_tpu.files.path  # noqa: F401
import amof_tpu.files.operation  # noqa: F401
