"""Native (C++) host-runtime components: threaded data-path kernels."""

from ssrl_vit_mae_jepa_tpu.runtime.native import gather_nhwc, native_available  # noqa: F401
