from libdogleg_tpu.native.loader import get_lib, native_available

__all__ = ["get_lib", "native_available"]
