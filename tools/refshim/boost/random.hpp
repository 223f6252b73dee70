// Shim mapping the boost::random names ldpc_lapack.cpp uses onto the C++
// standard library equivalents (same mt19937 algorithm; distribution
// draw order may differ from a stock Boost build, so noise REALIZATIONS
// differ while the statistics are identical — documented in
// results/reference_lapack_run.json).
#pragma once
#include <ctime>
#include <random>
namespace boost {
namespace random {
typedef std::mt19937 mt19937;
template <class IntType = int>
using uniform_int_distribution = std::uniform_int_distribution<IntType>;
template <class RealType = double>
using normal_distribution = std::normal_distribution<RealType>;
}  // namespace random
}  // namespace boost
