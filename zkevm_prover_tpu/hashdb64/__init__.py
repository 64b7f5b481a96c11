"""HashDB64 — the file-backed paged state backend (native C++).

Framework counterpart of the reference's src/hashdb64 (SURVEY.md §2.2:
"USE_NEW_KVTREE" — 4 KB pages mmapped from page files, page_manager.hpp:20-73,
KeyValuePage et al.). The page store itself is C++ (native/pagestore.cpp,
built on demand with g++ and bound via ctypes); `Database64` adapts it to the
same interface the SMT consumes, so `Smt` runs unchanged on either backend.
"""

from .page_store import PageStore, build_library
from .database64 import Database64

__all__ = ["PageStore", "Database64", "build_library"]
