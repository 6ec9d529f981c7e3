// Minimal nanobind ndarray shim — lets the READ-ONLY reference kernel
// sources compile unmodified into standalone baseline timing binaries
// (no Python, no real nanobind).  Only the API surface the reference
// kernels actually touch is provided: shape()/size()/data()/view() with
// C-contiguous row-major indexing, plus construction from a raw pointer
// + shape list (used by functions returning numpy arrays).
#pragma once
#include <cstddef>
#include <initializer_list>
#include <vector>

namespace nanobind {

struct ro {};
struct numpy {};
struct c_contig {};
template <std::size_t N> struct ndim {};

class capsule {
public:
    using dtor_t = void (*)(void *) noexcept;
    capsule() = default;
    capsule(void *p, dtor_t fn) : ptr_(p), fn_(fn) {}
    void *ptr_ = nullptr;
    dtor_t fn_ = nullptr;
};

namespace detail {
template <class... Ts> struct scalar_of { using type = double; };
template <class T, class... R> struct scalar_of<T, R...> { using type = T; };
template <class... R> struct scalar_of<numpy, R...> {
    using type = typename scalar_of<R...>::type;
};
}  // namespace detail

template <class... Ts>
class ndarray {
public:
    using Scalar = typename detail::scalar_of<Ts...>::type;

    ndarray() = default;
    ndarray(Scalar *data, std::initializer_list<std::size_t> shape,
            capsule owner = {})
        : data_(data), shape_(shape), owner_(owner) {}
    ndarray(Scalar *data, const std::vector<std::size_t> &shape,
            capsule owner = {})
        : data_(data), shape_(shape), owner_(owner) {}
    // converting ctor between tag variants (e.g. writable -> read-only)
    template <class... Us>
    ndarray(const ndarray<Us...> &other)
        : data_(other.data()), shape_(other.shapes()) {}

    const std::vector<std::size_t> &shapes() const { return shape_; }

    std::size_t shape(int i) const { return shape_[i]; }
    std::size_t ndim() const { return shape_.size(); }
    std::size_t size() const {
        std::size_t s = 1;
        for (auto v : shape_) s *= v;
        return s;
    }
    Scalar *data() const { return data_; }

    Scalar &operator()(std::size_t i) const { return data_[i]; }
    Scalar &operator()(std::size_t i, std::size_t j) const {
        return data_[i * shape_[1] + j];
    }
    Scalar &operator()(std::size_t i, std::size_t j, std::size_t k) const {
        return data_[(i * shape_[1] + j) * shape_[2] + k];
    }

    struct view_t {
        Scalar *d;
        std::size_t s1 = 1, s2 = 1;
        std::size_t sh[3] = {0, 0, 0};
        Scalar &operator()(std::size_t i) const { return d[i]; }
        Scalar &operator()(std::size_t i, std::size_t j) const {
            return d[i * s1 + j];
        }
        Scalar &operator()(std::size_t i, std::size_t j, std::size_t k) const {
            return d[(i * s1 + j) * s2 + k];
        }
        std::size_t shape(int i) const { return sh[i]; }
    };
    view_t view() const {
        view_t v;
        v.d = data_;
        if (shape_.size() > 1) v.s1 = shape_[1];
        if (shape_.size() > 2) v.s2 = shape_[2];
        for (std::size_t i = 0; i < shape_.size() && i < 3; i++)
            v.sh[i] = shape_[i];
        return v;
    }

private:
    Scalar *data_ = nullptr;
    std::vector<std::size_t> shape_;
    capsule owner_;
};

}  // namespace nanobind
