"""Native (C++) host-runtime components, loaded through ctypes."""

from a_nice_rag_tpu.native.build import load_text_lib  # noqa: F401
