#pragma once
/* Shim header: stands in for the external ftk ndarray library
 * (find_package(ndarray) in the reference CMake) which is not available
 * in this image.  The reference domain headers only use these types as
 * (shared) pointers in method signatures of IO methods the golden driver
 * never calls, so complete-but-empty types are enough. */
namespace ftk {
struct ndarray_group {};
struct stream {};
}  // namespace ftk
