// Shim translation unit: the reference repo never defines
// TINYOBJLOADER_IMPLEMENTATION in any TU (tiny_obj_loader.h:348), so HEAD
// does not link as checked in. This 2-line TU provides the implementation
// out-of-tree without modifying /root/reference.
#define TINYOBJLOADER_IMPLEMENTATION
#include "tiny_obj_loader.h"
