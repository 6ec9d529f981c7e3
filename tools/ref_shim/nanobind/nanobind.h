// Minimal nanobind core shim (see ndarray.h) — module/class registration
// becomes a dead static function so NB_MODULE blocks compile and disappear.
#pragma once
#include "ndarray.h"

namespace nanobind {

struct arg {
    explicit arg(const char * = nullptr) {}
    template <class T> arg operator=(T &&) const { return *this; }
};

template <class... Ts> struct init {};

struct module_ {
    template <class... A> module_ &def(A &&...) { return *this; }
};

template <class T>
struct class_ {
    template <class... A> explicit class_(A &&...) {}
    template <class... A> class_ &def(A &&...) { return *this; }
};

}  // namespace nanobind

#define NB_MODULE(name, var)                                                  \
    static void _nb_module_stub_##name(                                       \
        [[maybe_unused]] ::nanobind::module_ &var)
