// Shim over the reference Common/ImageBuffer.hpp (found next on the include
// path via #include_next) fixing ONE argument-passing defect in the TBB port:
//
// The reference's free SetPixel template takes its Accessor BY VALUE
// (/root/reference/src/Common/ImageBuffer.hpp:79-89).  With SYCL accessors
// and CUDA raw pointers that is a handle copy and the write sticks; the TBB
// VisualizeFixedDepth call sites pass `img_vec[k].mPixels`
// (std::vector<double>&), so every write lands in a temporary copy and the
// TBB fixed-depth image stays untouched (all zeros, alpha 0) -- verified by
// running the unmodified TU.  The GPU backends are the reference
// implementations of this kernel; to golden-test against their semantics we
// overload SetPixel/GetPixel for std::vector<double>& and forward the
// CUDA-style double* into the UNMODIFIED reference template, which performs
// the actual pixel math.  No reference logic is replaced.
#pragma once

#include_next "Common/ImageBuffer.hpp"

#include <vector>

namespace MOPS {

inline void SetPixel(std::vector<double>& img_acc, const int w, const int h,
                     const int i, const int j, const vec3& val)
{
    SetPixel(img_acc.data(), w, h, i, j, val);
}

inline void GetPixel(std::vector<double>& img_acc, const int w, const int h,
                     const int i, const int j, vec3& val)
{
    GetPixel(img_acc.data(), w, h, i, j, val);
}

}  // namespace MOPS
