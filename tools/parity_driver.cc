// Cross-engine parity driver: runs the REFERENCE C++ engine on a list of
// BMPs and prints its full, sorted class distribution in a machine-parseable
// form.
//
// This file is glue authored for this repo; it links against the reference
// sources compiled verbatim from /root/reference/src (the point is to
// exercise the reference engine itself as the correctness oracle, replacing
// its hard-coded single-image driver UT_CaffeEvaWrapper,
// /root/reference/src/UnitTest.cc:67-124, with argv-driven paths and
// high-precision output). Built by qcnn_tpu/eval/reference_engine.py; never
// part of the qcnn_tpu runtime.
//
// Usage: parity_driver <model> <main_dir> <cls_names> <img_labels> <top_k>
//        <bmp>...
// <model>: alexnet | caffenet | vgg_cnn_s | caffenet_fgb | caffenet_fgd
// (VGG16 is declared unsupported by the reference wrapper,
// CaffeEvaWrapper.cc:77-80)
//
// Output per image (stdout, amid the reference's own prints):
//   PARITY_IMG <path>
//   PARITY_ROW <rank> <class_id> <prob %.9g>   x top_k

#include <cstdio>
#include <cstdlib>
#include <string>

#include "CaffeEvaWrapper.h"

static bool ParseModel(const std::string& name, ENUM_CaffeModel* out) {
  if (name == "alexnet") *out = ENUM_CaffeModel::AlexNet;
  else if (name == "caffenet") *out = ENUM_CaffeModel::CaffeNet;
  else if (name == "vgg_cnn_s") *out = ENUM_CaffeModel::VggCnnS;
  else if (name == "caffenet_fgb") *out = ENUM_CaffeModel::CaffeNetFGB;
  else if (name == "caffenet_fgd") *out = ENUM_CaffeModel::CaffeNetFGD;
  else return false;
  return true;
}

int main(int argc, char* argv[]) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: %s <model> <main_dir> <cls_names> <img_labels> "
                 "<top_k> <bmp>...\n",
                 argv[0]);
    return 2;
  }
  ENUM_CaffeModel model;
  if (!ParseModel(argv[1], &model)) {
    std::fprintf(stderr, "PARITY_ERR unknown model %s\n", argv[1]);
    return 2;
  }
  const std::string mainDir = argv[2];
  const std::string clsNames = argv[3];
  const std::string imgLabls = argv[4];
  const int topK = std::atoi(argv[5]);
  if (topK <= 0) {
    std::fprintf(stderr, "PARITY_ERR top_k must be a positive integer\n");
    return 2;
  }

  CaffeEvaWrapper wrapper;
  if (!wrapper.SetPath(mainDir, clsNames, imgLabls)) {
    std::fprintf(stderr, "PARITY_ERR SetPath: %s\n",
                 wrapper.GetErrorMsg().c_str());
    return 1;
  }
  if (!wrapper.SetModel(model, ENUM_CompMethod::Aprx)) {
    std::fprintf(stderr, "PARITY_ERR SetModel: %s\n",
                 wrapper.GetErrorMsg().c_str());
    return 1;
  }
  for (int i = 6; i < argc; ++i) {
    CaffeEvaRslt rslt;
    rslt.clsCntPred = topK;
    if (!wrapper.Proc(argv[i], &rslt)) {
      std::fprintf(stderr, "PARITY_ERR Proc(%s): %s\n", argv[i],
                   wrapper.GetErrorMsg().c_str());
      return 1;
    }
    std::printf("PARITY_IMG %s\n", argv[i]);
    for (size_t r = 0; r < rslt.clsIdxLst.size(); ++r) {
      std::printf("PARITY_ROW %zu %d %.9g\n", r, rslt.clsIdxLst[r],
                  rslt.clsProbLst[r]);
    }
  }
  std::fflush(stdout);
  return 0;
}
