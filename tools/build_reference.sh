#!/bin/bash
# Build the C++ reference (/root/reference) headless for benchmarking
# (BENCH_ACCURACY.md). Produces /tmp/refbuild/bin/{rgbd_tum,stereo_kitti,
# mono_tum,mono_kitti,stereo_euroc,mono_euroc} and stages them in the
# Examples/ layout tools/head_to_head.py expects (REF_BUILD=/tmp/refbuild).
#
# Patches applied to the COPY only (sources in /root/reference untouched):
#   - fake pangolin header + stub Viewer.cc/MapDrawer.cc (headless)
#   - OpenCV 4.6 shim (legacy constants force-included; fake opencv/cv.h)
#   - Eigen from the TF-vendored copy; -mno-avx512fp16 (g++12 packet bug)
#   - C++17 std::map allocator pair-constness fix in LoopClosing.h
# The vocabulary is exported from our trained npz (DBoW2 text format).
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}
EIGEN_SRC=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null \
  || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)

mkdir -p "$OUT" /tmp/eigen
[ -d /tmp/eigen/Eigen ] || cp -r "$EIGEN_SRC/Eigen" "$EIGEN_SRC/unsupported" /tmp/eigen/
cp -r "$REF/src" "$REF/include" "$REF/Thirdparty" "$REF/Examples" "$OUT/"

# C++17 fix: allocator value_type must match std::map's value_type
sed -i 's|std::pair<const KeyFrame\*, g2o::Sim3>|std::pair<KeyFrame* const, g2o::Sim3>|' \
  "$OUT/include/LoopClosing.h"

printf '#ifndef G2O_CONFIG_H\n#define G2O_CONFIG_H\n#endif\n' > "$OUT/Thirdparty/g2o/config.h"

mkdir -p "$OUT/fakepangolin/pangolin" "$OUT/fakeocv/opencv"
cat > "$OUT/fakepangolin/pangolin/pangolin.h" <<'EOF'
#ifndef FAKE_PANGOLIN_H
#define FAKE_PANGOLIN_H
namespace pangolin {
struct OpenGlMatrix {
  double m[16];
  OpenGlMatrix() { SetIdentity(); }
  void SetIdentity() {
    for (int i = 0; i < 16; ++i) m[i] = 0.0;
    m[0] = m[5] = m[10] = m[15] = 1.0;
  }
};
inline void BindToContext(const char*) {}
}
#endif
EOF
printf '#include <opencv2/opencv.hpp>\n' > "$OUT/fakeocv/opencv/cv.h"
cat > "$OUT/cv4shim.h" <<'EOF'
#ifndef CV4SHIM_H
#define CV4SHIM_H
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/imgproc/types_c.h>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgcodecs/legacy/constants_c.h>
#include <opencv2/calib3d.hpp>
#endif
#include <unistd.h>
EOF

# headless stubs
cat > "$OUT/src/MapDrawer.cc" <<'EOF'
#include "MapDrawer.h"
namespace ORB_SLAM2 {
MapDrawer::MapDrawer(Map* pMap, const string&) : mpMap(pMap) {
  mKeyFrameSize = 0.05f; mKeyFrameLineWidth = 1.0f; mGraphLineWidth = 0.9f;
  mPointSize = 2.0f; mCameraSize = 0.08f; mCameraLineWidth = 3.0f;
}
void MapDrawer::DrawMapPoints() {}
void MapDrawer::DrawKeyFrames(const bool, const bool) {}
void MapDrawer::DrawCurrentCamera(pangolin::OpenGlMatrix&) {}
void MapDrawer::SetCurrentCameraPose(const cv::Mat& Tcw) {
  std::unique_lock<std::mutex> lock(mMutexCamera);
  mCameraPose = Tcw.clone();
}
void MapDrawer::SetReferenceKeyFrame(KeyFrame*) {}
void MapDrawer::GetCurrentOpenGLCameraMatrix(pangolin::OpenGlMatrix& M) {
  M.SetIdentity();
}
}
EOF
cat > "$OUT/src/Viewer.cc" <<'EOF'
#include "Viewer.h"
#include <unistd.h>
namespace ORB_SLAM2 {
Viewer::Viewer(System* pSystem, FrameDrawer* pFrameDrawer, MapDrawer* pMapDrawer,
               Tracking* pTracking, const string&)
    : mpSystem(pSystem), mpFrameDrawer(pFrameDrawer), mpMapDrawer(pMapDrawer),
      mpTracker(pTracking), mT(33.0), mImageWidth(640), mImageHeight(480),
      mViewpointX(0), mViewpointY(-0.7f), mViewpointZ(-1.8f), mViewpointF(500),
      mbFinishRequested(false), mbFinished(true), mbStopped(true),
      mbStopRequested(false) {}
void Viewer::Run() {
  { std::unique_lock<std::mutex> l(mMutexFinish); mbFinished = false; }
  { std::unique_lock<std::mutex> l(mMutexStop); mbStopped = false; }
  while (true) {
    if (Stop()) { while (isStopped()) usleep(3000); }
    if (CheckFinish()) break;
    usleep(5000);
  }
  SetFinish();
}
void Viewer::RequestFinish() { std::unique_lock<std::mutex> l(mMutexFinish); mbFinishRequested = true; }
bool Viewer::CheckFinish() { std::unique_lock<std::mutex> l(mMutexFinish); return mbFinishRequested; }
void Viewer::SetFinish() { std::unique_lock<std::mutex> l(mMutexFinish); mbFinished = true; }
bool Viewer::isFinished() { std::unique_lock<std::mutex> l(mMutexFinish); return mbFinished; }
void Viewer::RequestStop() { std::unique_lock<std::mutex> l(mMutexStop); if (!mbStopped) mbStopRequested = true; }
bool Viewer::isStopped() { std::unique_lock<std::mutex> l(mMutexStop); return mbStopped; }
bool Viewer::Stop() {
  std::unique_lock<std::mutex> l(mMutexStop);
  std::unique_lock<std::mutex> l2(mMutexFinish);
  if (mbFinishRequested) return false;
  if (mbStopRequested) { mbStopped = true; mbStopRequested = false; return true; }
  return false;
}
void Viewer::Release() { std::unique_lock<std::mutex> l(mMutexStop); mbStopped = false; }
}
EOF

cat > "$OUT/Makefile" <<'EOF'
CXX := g++
EIGEN := /tmp/eigen
CXXFLAGS := -O3 -march=native -mno-avx512fp16 -std=c++14 -w -fPIC -DCOMPILEDWITHC11 \
  -include $(CURDIR)/cv4shim.h \
  -I$(CURDIR) -I$(CURDIR)/include -I$(CURDIR)/fakepangolin \
  -I$(CURDIR)/Thirdparty/g2o -I$(CURDIR)/Thirdparty/g2o/g2o/core \
  -I$(CURDIR)/Thirdparty/g2o/g2o/types -I$(CURDIR)/Thirdparty/g2o/g2o/stuff \
  -I$(EIGEN) -I$(CURDIR)/fakeocv -I/usr/include/opencv4
LDLIBS := -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lopencv_features2d \
  -lopencv_calib3d -lopencv_highgui -lpthread
DBOW2_SRC := $(wildcard Thirdparty/DBoW2/DBoW2/*.cpp) $(wildcard Thirdparty/DBoW2/DUtils/*.cpp)
G2O_SRC := $(wildcard Thirdparty/g2o/g2o/core/*.cpp) \
  $(wildcard Thirdparty/g2o/g2o/stuff/*.cpp) \
  $(wildcard Thirdparty/g2o/g2o/types/*.cpp)
G2O_C := $(wildcard Thirdparty/g2o/g2o/stuff/*.c)
LIB_SRC := $(wildcard src/*.cc)
OBJ := $(LIB_SRC:.cc=.o) $(DBOW2_SRC:.cpp=.o) $(G2O_SRC:.cpp=.o) $(G2O_C:.c=.o)
BINS := bin/rgbd_tum bin/stereo_kitti bin/mono_tum bin/mono_kitti bin/stereo_euroc bin/mono_euroc
all: $(BINS)
%.o: %.cpp
	$(CXX) $(CXXFLAGS) -c $< -o $@
%.o: %.cc
	$(CXX) $(CXXFLAGS) -c $< -o $@
%.o: %.c
	$(CXX) $(CXXFLAGS) -c $< -o $@
liborbslam2.a: $(OBJ)
	ar rcs $@ $^
bin/%: Examples/RGB-D/%.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
bin/rgbd_tum: Examples/RGB-D/rgbd_tum.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
bin/stereo_kitti: Examples/Stereo/stereo_kitti.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
bin/stereo_euroc: Examples/Stereo/stereo_euroc.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
bin/mono_tum: Examples/Monocular/mono_tum.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
bin/mono_kitti: Examples/Monocular/mono_kitti.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
bin/mono_euroc: Examples/Monocular/mono_euroc.o liborbslam2.a
	@mkdir -p bin
	$(CXX) $^ -o $@ $(LDLIBS)
clean:
	rm -f $(OBJ) liborbslam2.a Examples/*/*.o
	rm -rf bin
EOF

( cd "$OUT" && make -j"$(nproc)" )
cp "$OUT"/bin/rgbd_tum "$OUT/Examples/RGB-D/"
cp "$OUT"/bin/stereo_kitti "$OUT"/bin/stereo_euroc "$OUT/Examples/Stereo/"
cp "$OUT"/bin/mono_tum "$OUT"/bin/mono_kitti "$OUT"/bin/mono_euroc "$OUT/Examples/Monocular/"

# vocabulary for the reference (our trained tree in DBoW2 text format)
python - <<PYEOF
import sys, jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "$(cd "$(dirname "$0")/.." && pwd)")
from orb_slam2_comment_tpu.ops import bow
voc = bow.load_vocabulary("$(cd "$(dirname "$0")/.." && pwd)/orb_slam2_comment_tpu/assets/voc_synth.npz")
bow.save_orb_vocab_text("$OUT/Vocabulary_synth.txt", voc)
print("vocabulary exported")
PYEOF
echo "reference built at $OUT"
