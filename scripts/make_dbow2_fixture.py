"""Generate the DBoW2 format/semantics fixture (tests/assets/dbow2_*).

Compiles the UPSTREAM DBoW2 sources (the vendored library at
$ORB_SLAM3_REF/Thirdparty/DBoW2, reference: TemplatedVocabulary.h:1338
loadFromTextFile / :1460 saveToTextFile) against OpenCV, trains a real
vocabulary on deterministic descriptors, exports it with DBoW2's own text
writer, and records DBoW2's own word assignments + one BowVector L1 score
as the oracle. tests/test_vocab_text.py then gates this framework's
load_orbvoc_text + transform against that committed fixture — a true
out-of-distribution format gate that needs no network and no reference
checkout at test time.

Run once (needs g++, OpenCV dev headers, and the reference checkout):
    ORB_SLAM3_REF=/root/reference python scripts/make_dbow2_fixture.py
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REF = os.environ.get("ORB_SLAM3_REF", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")

# The vendored DBoW2 fork adds boost-serialization hooks (friend
# declarations + never-instantiated serialize templates). The harness never
# serializes, so header stubs satisfy the includes without boost installed.
BOOST_STUB = r"""
#pragma once
namespace boost { namespace serialization {
class access {};
template <class Base, class Derived> Base& base_object(Derived& d) {
  return static_cast<Base&>(d);
}
}}
"""

HARNESS = r"""
#include <cstring>
#include <fstream>
#include <iterator>
#include <vector>
#include <opencv2/core.hpp>
#include "DBoW2/FORB.h"
#include "DBoW2/TemplatedVocabulary.h"
using namespace DBoW2;
typedef TemplatedVocabulary<FORB::TDescriptor, FORB> OrbVoc;

// Expose the protected per-feature transform: the public getWordWeight
// goes through m_words Node POINTERS, which dangle after loadFromTextFile
// reallocates m_nodes past its reserve (the trailing-newline spurious node
// overflows a COMPLETE tree's expected_nodes reserve). transform() is
// index-based and safe — it is also exactly the accessor the SLAM runtime
// uses, so the oracle reflects real usage.
struct OrbVocX : public OrbVoc {
  OrbVocX(int k, int L, WeightingType w, ScoringType s) : OrbVoc(k, L, w, s) {}
  OrbVocX() : OrbVoc() {}
  void xform(const cv::Mat& f, WordId& id, WordValue& w) const {
    transform(f, id, w);
  }
};

static std::vector<cv::Mat> readDescs(const char* path) {
  std::ifstream f(path, std::ios::binary);
  std::vector<unsigned char> buf((std::istreambuf_iterator<char>(f)),
                                 std::istreambuf_iterator<char>());
  size_t n = buf.size() / 32;
  std::vector<cv::Mat> out;
  for (size_t i = 0; i < n; i++) {
    cv::Mat d(1, 32, CV_8U);
    std::memcpy(d.data, &buf[i * 32], 32);
    out.push_back(d);
  }
  return out;
}

int main(int argc, char** argv) {
  // argv: train.bin query.bin out_voc.txt out_oracle.txt
  std::vector<cv::Mat> train = readDescs(argv[1]);
  std::vector<std::vector<cv::Mat> > features;
  for (size_t i = 0; i < train.size(); i += 150) {
    std::vector<cv::Mat> img;
    for (size_t j = i; j < std::min(i + 150, train.size()); j++)
      img.push_back(train[j]);
    features.push_back(img);
  }
  OrbVoc voc(10, 2, TF_IDF, L1_NORM);
  voc.create(features);
  voc.saveToTextFile(argv[3]);
  // the oracle must reflect the FILE, not the in-memory tree
  OrbVocX voc2;
  if (!voc2.loadFromTextFile(argv[3])) return 1;
  std::vector<cv::Mat> query = readDescs(argv[2]);
  std::ofstream o(argv[4]);
  o.precision(12);
  for (size_t i = 0; i < query.size(); i++) {
    WordId id; WordValue w;
    voc2.xform(query[i], id, w);
    o << id << " " << w << "\n";
  }
  std::vector<cv::Mat> qa(query.begin(), query.begin() + query.size() / 2);
  std::vector<cv::Mat> qb(query.begin() + query.size() / 2, query.end());
  BowVector va, vb;
  voc2.transform(qa, va);
  voc2.transform(qb, vb);
  o << "SCORE " << voc2.score(va, vb) << "\n";
  return 0;
}
"""


def main():
    dbow2 = os.path.join(REF, "Thirdparty", "DBoW2")
    assert os.path.isdir(dbow2), f"reference DBoW2 not found at {dbow2}"
    os.makedirs(OUT_DIR, exist_ok=True)
    rng = np.random.default_rng(42)

    def flip_bits(descs, n_bits):
        out = descs.copy()
        for r in out:
            for pos in rng.choice(256, n_bits, replace=False):
                r[pos // 8] ^= np.uint8(1 << (pos % 8))
        return out

    # Hierarchy-matched corpus: 10 super-anchors (~128 bits apart) x 10
    # sub-anchors (16 bits from their super), samples 2 bits from a sub.
    # DBoW2's create() segfaults when a k-means split empties a cluster
    # (released centroid Mat -> null FORB::distance read), which happens
    # whenever k exceeds a level's natural cluster count — so the corpus
    # gives every split of the (k=10, L=2) tree exactly 10 tight,
    # well-separated clusters.
    supers = rng.integers(0, 256, (10, 32), dtype=np.uint8)
    subs = np.concatenate(
        [flip_bits(np.repeat(s0[None], 10, 0), 16) for s0 in supers]
    )  # (100, 32)
    train = flip_bits(subs[rng.integers(0, 100, 3200)], 2)
    train = np.unique(train, axis=0)
    train = train[rng.permutation(len(train))][:3000]
    query = flip_bits(subs[rng.integers(0, 100, 512)], 3)
    with tempfile.TemporaryDirectory() as td:
        train_bin = os.path.join(td, "train.bin")
        query_bin = os.path.join(td, "query.bin")
        train.tofile(train_bin)
        query.tofile(query_bin)
        src = os.path.join(td, "harness.cc")
        with open(src, "w") as f:
            f.write(HARNESS)
        stub_dir = os.path.join(td, "boost", "serialization")
        os.makedirs(stub_dir)
        for name in ("serialization.hpp", "map.hpp"):
            with open(os.path.join(stub_dir, name), "w") as f:
                f.write(BOOST_STUB)
        exe = os.path.join(td, "harness")
        inc = subprocess.run(
            ["pkg-config", "--cflags", "--libs", "opencv4"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        subprocess.run(
            ["g++", "-O2", "-std=c++14", src,
             os.path.join(dbow2, "DBoW2", "FORB.cpp"),
             os.path.join(dbow2, "DBoW2", "ScoringObject.cpp"),
             os.path.join(dbow2, "DBoW2", "BowVector.cpp"),
             os.path.join(dbow2, "DBoW2", "FeatureVector.cpp"),
             os.path.join(dbow2, "DUtils", "Random.cpp"),
             os.path.join(dbow2, "DUtils", "Timestamp.cpp"),
             f"-I{dbow2}", f"-I{td}", "-o", exe] + inc,
            check=True,
        )
        voc_txt = os.path.join(OUT_DIR, "dbow2_voc.txt")
        oracle_txt = os.path.join(td, "oracle.txt")
        subprocess.run(
            [exe, train_bin, query_bin, voc_txt, oracle_txt], check=True
        )
        wids, wvals, score = [], [], None
        with open(oracle_txt) as f:
            for line in f:
                p = line.split()
                if p[0] == "SCORE":
                    score = float(p[1])
                else:
                    wids.append(int(p[0]))
                    wvals.append(float(p[1]))
        np.savez_compressed(
            os.path.join(OUT_DIR, "dbow2_oracle.npz"),
            query=query, word_id=np.array(wids, np.int32),
            word_weight=np.array(wvals, np.float64),
            l1_score=np.float64(score),
        )
    n_lines = sum(1 for _ in open(voc_txt))
    print(f"wrote {voc_txt} ({n_lines} lines), oracle over {len(wids)} queries, "
          f"L1 score {score:.6f}")


if __name__ == "__main__":
    sys.exit(main())
