// extern-C shim over the REFERENCE deformation-transfer solver.
//
// The head-to-head baseline (tools/reference_headtohead.py) needs to time
// the reference's own Eigen SparseLU mesh reconstruction
// (/root/reference/deformation/cpp/src/deform_triangle_impl.hpp:215-310),
// but the pybind11 vendored there (deformation/cpp/ext/pybind11) predates
// Python 3.12 (opaque PyFrameObject) and the reference tree is read-only.
// This file compiles the reference headers VERBATIM (include path points
// into /root/reference) and exposes the same four entry points the
// reference's pybind.cpp exposes, as a C ABI for ctypes.  No reference
// code is copied — see the Makefile's -I flags.
//
// Mirrors pybind.cpp:10 (one global manager) and the call protocol of
// speech_anime/viewer/frame.py:102-153.

#include <cstdint>
#include "deform.hpp"

static deformation::TriangleDeformation gDeformManager;

extern "C" {

int ref_set_target(const float *verts, int n_verts, const uint32_t *faces,
                   int n_tris, const uint32_t *cnsts, int n_cnsts,
                   double reg) {
  return gDeformManager.setStaticTarget(verts, (size_t)n_verts, faces,
                                        (size_t)n_tris, cnsts,
                                        (size_t)n_cnsts,
                                        (const uint32_t *)nullptr, reg)
             ? 1
             : 0;
}

int ref_n_tar_verts() { return (int)gDeformManager.n_tar_verts(); }

// out_verts: (n_tar_verts, 3) f32; dgrad: (n_tris*9,) f64;
// cnst_verts: (n_cnsts, 3) f32 or nullptr.
int ref_get_mesh_from_dg(float *out_verts, const double *dgrad,
                         const float *cnst_verts) {
  return gDeformManager.getMeshFromDeformationGradients(
             out_verts, dgrad, cnst_verts, (const uint32_t *)nullptr,
             (const uint32_t *)nullptr)
             ? 1
             : 0;
}

// out_dgrad: (n_tris*9,) f64
int ref_get_deform_grad(double *out_dgrad, const float *verts_a,
                        const float *verts_b, int n_verts,
                        const uint32_t *faces, int n_tris, double eps) {
  return gDeformManager.getDeformationGradients(out_dgrad, verts_a, verts_b,
                                                (size_t)n_verts, faces,
                                                (size_t)n_tris, eps)
             ? 1
             : 0;
}

}  // extern "C"
