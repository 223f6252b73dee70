// Minimal standard-behavior stand-in for the slice of Boost.uBLAS that
// /root/reference/apps/ldpc_lapack.cpp uses (this image has no Boost).
// Written from scratch against the documented uBLAS interface — dense
// vector/matrix containers, row/column/range proxies, prod/inner_prod/
// element_prod — NOT derived from Boost sources. Only the operations the
// reference app exercises are provided; semantics (element access, proxy
// assignment, expression conversion) match uBLAS for those operations.
#pragma once

#include <cstddef>
#include <type_traits>
#include <utility>
#include <vector>

namespace boost {
namespace numeric {
namespace ublas {

template <class T>
class vector {
  std::vector<T> d_;

 public:
  typedef T value_type;
  vector() = default;
  explicit vector(std::size_t n) : d_(n, T()) {}
  vector(std::size_t n, const T& v) : d_(n, v) {}
  // converting constructor from any vector-like expression (another
  // vector<U>, a row/column/range proxy, an operator result)
  template <class E,
            class = decltype(std::declval<const E&>()(std::size_t(0))),
            class = decltype(std::declval<const E&>().size())>
  vector(const E& e) : d_(e.size()) {
    for (std::size_t i = 0; i < d_.size(); ++i)
      d_[i] = static_cast<T>(e(i));
  }
  std::size_t size() const { return d_.size(); }
  T& operator()(std::size_t i) { return d_[i]; }
  const T& operator()(std::size_t i) const { return d_[i]; }
};

template <class T>
class zero_matrix {
  std::size_t m_, n_;

 public:
  typedef T value_type;
  zero_matrix(std::size_t m, std::size_t n) : m_(m), n_(n) {}
  std::size_t size1() const { return m_; }
  std::size_t size2() const { return n_; }
  T operator()(std::size_t, std::size_t) const { return T(); }
};

template <class T>
class matrix {
  std::size_t m_ = 0, n_ = 0;
  std::vector<T> d_;

 public:
  typedef T value_type;
  matrix() = default;
  matrix(std::size_t m, std::size_t n) : m_(m), n_(n), d_(m * n, T()) {}
  template <class E, class = decltype(std::declval<const E&>().size1())>
  matrix(const E& e) : m_(e.size1()), n_(e.size2()), d_(m_ * n_) {
    for (std::size_t i = 0; i < m_; ++i)
      for (std::size_t j = 0; j < n_; ++j)
        d_[i * n_ + j] = static_cast<T>(e(i, j));
  }
  std::size_t size1() const { return m_; }
  std::size_t size2() const { return n_; }
  T& operator()(std::size_t i, std::size_t j) { return d_[i * n_ + j]; }
  const T& operator()(std::size_t i, std::size_t j) const {
    return d_[i * n_ + j];
  }
};

// ---- proxies -------------------------------------------------------------

template <class M>
class matrix_row {
  M& m_;
  std::size_t i_;

 public:
  typedef typename std::remove_const<M>::type::value_type value_type;
  matrix_row(M& m, std::size_t i) : m_(m), i_(i) {}
  std::size_t size() const { return m_.size2(); }
  value_type operator()(std::size_t j) const { return m_(i_, j); }
  matrix_row& operator=(const matrix_row& e) {
    for (std::size_t j = 0; j < size(); ++j)
      m_(i_, j) = static_cast<value_type>(e(j));
    return *this;
  }
  template <class E>
  matrix_row& operator=(const E& e) {
    for (std::size_t j = 0; j < size(); ++j)
      m_(i_, j) = static_cast<value_type>(e(j));
    return *this;
  }
};

template <class M>
class matrix_column {
  M& m_;
  std::size_t j_;

 public:
  typedef typename std::remove_const<M>::type::value_type value_type;
  matrix_column(M& m, std::size_t j) : m_(m), j_(j) {}
  std::size_t size() const { return m_.size1(); }
  value_type operator()(std::size_t i) const { return m_(i, j_); }
  matrix_column& operator=(const matrix_column& e) {
    for (std::size_t i = 0; i < size(); ++i)
      m_(i, j_) = static_cast<value_type>(e(i));
    return *this;
  }
  template <class E>
  matrix_column& operator=(const E& e) {
    for (std::size_t i = 0; i < size(); ++i)
      m_(i, j_) = static_cast<value_type>(e(i));
    return *this;
  }
};

template <class M>
class matrix_range {
  M& m_;
  std::size_t r0_, r1_, c0_, c1_;

 public:
  typedef typename std::remove_const<M>::type::value_type value_type;
  matrix_range(M& m, std::size_t r0, std::size_t r1, std::size_t c0,
               std::size_t c1)
      : m_(m), r0_(r0), r1_(r1), c0_(c0), c1_(c1) {}
  std::size_t size1() const { return r1_ - r0_; }
  std::size_t size2() const { return c1_ - c0_; }
  value_type operator()(std::size_t i, std::size_t j) const {
    return m_(r0_ + i, c0_ + j);
  }
  matrix_range& operator=(const matrix_range& e) {
    for (std::size_t i = 0; i < size1(); ++i)
      for (std::size_t j = 0; j < size2(); ++j)
        m_(r0_ + i, c0_ + j) = static_cast<value_type>(e(i, j));
    return *this;
  }
  template <class E>
  matrix_range& operator=(const E& e) {
    for (std::size_t i = 0; i < size1(); ++i)
      for (std::size_t j = 0; j < size2(); ++j)
        m_(r0_ + i, c0_ + j) = static_cast<value_type>(e(i, j));
    return *this;
  }
};

template <class V>
class vector_range {
  V& v_;
  std::size_t s_, e_;

 public:
  typedef typename std::remove_const<V>::type::value_type value_type;
  vector_range(V& v, std::size_t s, std::size_t e) : v_(v), s_(s), e_(e) {}
  std::size_t size() const { return e_ - s_; }
  value_type operator()(std::size_t i) const { return v_(s_ + i); }
  vector_range& operator=(const vector_range& e) {
    for (std::size_t i = 0; i < size(); ++i)
      v_(s_ + i) = static_cast<value_type>(e(i));
    return *this;
  }
  template <class E>
  vector_range& operator=(const E& e) {
    for (std::size_t i = 0; i < size(); ++i)
      v_(s_ + i) = static_cast<value_type>(e(i));
    return *this;
  }
};

template <class M>
matrix_row<M> row(M& m, std::size_t i) {
  return matrix_row<M>(m, i);
}

template <class M>
matrix_column<M> column(M& m, std::size_t j) {
  return matrix_column<M>(m, j);
}

template <class M>
matrix_range<M> subrange(M& m, std::size_t r0, std::size_t r1, std::size_t c0,
                         std::size_t c1) {
  return matrix_range<M>(m, r0, r1, c0, c1);
}

template <class V>
vector_range<V> subrange(V& v, std::size_t s, std::size_t e) {
  return vector_range<V>(v, s, e);
}

// ---- expressions ---------------------------------------------------------

template <class A, class B,
          class R = typename std::common_type<
              decltype(std::declval<const A&>()(std::size_t(0))),
              decltype(std::declval<const B&>()(std::size_t(0)))>::type>
vector<R> operator+(const A& a, const B& b) {
  vector<R> out(a.size());
  for (std::size_t i = 0; i < a.size(); ++i)
    out(i) = static_cast<R>(a(i)) + static_cast<R>(b(i));
  return out;
}

template <class A, class R = typename std::decay<decltype(
                       std::declval<const A&>()(std::size_t(0)))>::type>
vector<R> operator-(const A& a) {
  vector<R> out(a.size());
  for (std::size_t i = 0; i < a.size(); ++i) out(i) = -a(i);
  return out;
}

template <class A, class B,
          class R = typename std::common_type<
              decltype(std::declval<const A&>()(std::size_t(0))),
              decltype(std::declval<const B&>()(std::size_t(0)))>::type>
R inner_prod(const A& a, const B& b) {
  R acc = R();
  for (std::size_t i = 0; i < a.size(); ++i)
    acc += static_cast<R>(a(i)) * static_cast<R>(b(i));
  return acc;
}

template <class A, class B,
          class R = typename std::common_type<
              decltype(std::declval<const A&>()(std::size_t(0))),
              decltype(std::declval<const B&>()(std::size_t(0)))>::type>
vector<R> element_prod(const A& a, const B& b) {
  vector<R> out(a.size());
  for (std::size_t i = 0; i < a.size(); ++i)
    out(i) = static_cast<R>(a(i)) * static_cast<R>(b(i));
  return out;
}

template <class A, class V,
          class R = typename std::common_type<
              decltype(std::declval<const A&>()(std::size_t(0),
                                                std::size_t(0))),
              decltype(std::declval<const V&>()(std::size_t(0)))>::type>
vector<R> prod(const A& a, const V& v) {
  vector<R> out(a.size1());
  for (std::size_t i = 0; i < a.size1(); ++i) {
    R acc = R();
    for (std::size_t j = 0; j < a.size2(); ++j)
      acc += static_cast<R>(a(i, j)) * static_cast<R>(v(j));
    out(i) = acc;
  }
  return out;
}

}  // namespace ublas
}  // namespace numeric
}  // namespace boost
