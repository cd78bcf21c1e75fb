"""Native (C++) runtime components, consumed via ctypes."""
from .loader import NativeDataloader, native_available

__all__ = ["NativeDataloader", "native_available"]
