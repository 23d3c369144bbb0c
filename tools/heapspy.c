/* LD_PRELOAD malloc interposer for the heap-model investigation
 * (VERDICT r4 item 6): logs every malloc/free so the analysis can replay
 * glibc's tcache/fastbin behaviour for the 96-byte chunk class that
 * `Edge` (sizeof == 88) shares with read-length std::string buffers.
 *
 * Log format (text, one event per line, written with raw write()):
 *   m <size> <ptr>\n      malloc/new returning <ptr>
 *   f <ptr>\n             free/delete of <ptr>
 * Output fd comes from MG_HEAPSPY_FD (the harness opens the file and
 * passes the fd number), so no stdio/allocations happen in the hot path.
 *
 * Build: gcc -O2 -shared -fPIC -o heapspy.so heapspy.c -ldl
 */
#define _GNU_SOURCE
#include <dlfcn.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include <stdio.h>

static void *(*real_malloc)(size_t) = 0;
static void (*real_free)(void *) = 0;
static void *(*real_calloc)(size_t, size_t) = 0;
static void *(*real_realloc)(void *, size_t) = 0;
static int log_fd = -1;
static int initing = 0;

/* bootstrap allocator for dlsym's own calloc use */
static char boot_buf[65536];
static size_t boot_off = 0;

static void init(void) {
    if (real_malloc) return;
    initing = 1;
    real_malloc = dlsym(RTLD_NEXT, "malloc");
    real_free = dlsym(RTLD_NEXT, "free");
    real_calloc = dlsym(RTLD_NEXT, "calloc");
    real_realloc = dlsym(RTLD_NEXT, "realloc");
    const char *fd = getenv("MG_HEAPSPY_FD");
    log_fd = fd ? atoi(fd) : 2;
    initing = 0;
}

static char wbuf[1 << 16];
static size_t wlen = 0;

static void flush_buf(void) {
    if (wlen) { ssize_t r = write(log_fd, wbuf, wlen); (void)r; wlen = 0; }
}

static void emit(char tag, size_t size, void *p) {
    char line[64];
    size_t n = 0;
    line[n++] = tag;
    line[n++] = ' ';
    if (tag == 'm') {
        char tmp[24]; size_t t = 0; size_t v = size;
        do { tmp[t++] = '0' + v % 10; v /= 10; } while (v);
        while (t) line[n++] = tmp[--t];
        line[n++] = ' ';
    }
    { char tmp[24]; size_t t = 0; size_t v = (size_t)p;
      do { tmp[t++] = "0123456789abcdef"[v & 15]; v >>= 4; } while (v);
      while (t) line[n++] = tmp[--t]; }
    line[n++] = '\n';
    if (wlen + n > sizeof(wbuf)) flush_buf();
    memcpy(wbuf + wlen, line, n);
    wlen += n;
}

__attribute__((destructor)) static void fini(void) { flush_buf(); }

/* phase markers: every fopen records 'o <path>' in the event stream, so
 * the analysis can align heap events with the assembler's phases (the
 * reference opens .unitig/_flow.input/graph*.gdl at known points). */
static FILE *(*real_fopen)(const char *, const char *) = 0;
FILE *fopen(const char *path, const char *mode) {
    if (!real_fopen) real_fopen = dlsym(RTLD_NEXT, "fopen");
    {
        char line[512];
        size_t n = 0, i;
        line[n++] = 'o';
        line[n++] = ' ';
        for (i = 0; path[i] && n < sizeof(line) - 2; i++)
            line[n++] = path[i];
        line[n++] = '\n';
        if (wlen + n > sizeof(wbuf)) flush_buf();
        memcpy(wbuf + wlen, line, n);
        wlen += n;
    }
    return real_fopen(path, mode);
}

/* C++ operator new/delete interposers with CALL-SITE capture: at -O0
 * every `new Edge` has a fixed return PC resolvable by addr2line, which
 * separates Edge allocations from std::string buffers sharing the same
 * malloc size class.  Records: n <size> <ptr> <retaddr> / d <ptr> <ra>. */
static void emit_site(char tag, size_t size, void *p, void *ra) {
    char line[96];
    size_t n = 0;
    line[n++] = tag;
    line[n++] = ' ';
    if (tag == 'n') {
        char tmp[24]; size_t t = 0; size_t v = size;
        do { tmp[t++] = '0' + v % 10; v /= 10; } while (v);
        while (t) line[n++] = tmp[--t];
        line[n++] = ' ';
    }
    { char tmp[24]; size_t t = 0; size_t v = (size_t)p;
      do { tmp[t++] = "0123456789abcdef"[v & 15]; v >>= 4; } while (v);
      while (t) line[n++] = tmp[--t]; }
    line[n++] = ' ';
    { char tmp[24]; size_t t = 0; size_t v = (size_t)ra;
      do { tmp[t++] = "0123456789abcdef"[v & 15]; v >>= 4; } while (v);
      while (t) line[n++] = tmp[--t]; }
    line[n++] = '\n';
    if (wlen + n > sizeof(wbuf)) flush_buf();
    memcpy(wbuf + wlen, line, n);
    wlen += n;
}

void *_Znwm(size_t size) {              /* operator new(size_t) */
    if (!real_malloc) init();
    void *p = real_malloc(size);
    emit_site('n', size, p, __builtin_return_address(0));
    return p;
}

void *_Znam(size_t size) {              /* operator new[](size_t) */
    if (!real_malloc) init();
    void *p = real_malloc(size);
    emit_site('n', size, p, __builtin_return_address(0));
    return p;
}

void _ZdlPv(void *p) {                  /* operator delete(void*) */
    if (!p) return;
    if (!real_free) init();
    emit_site('d', 0, p, __builtin_return_address(0));
    real_free(p);
}

void _ZdlPvm(void *p, size_t s) {       /* sized operator delete */
    (void)s;
    _ZdlPv(p);
}

void _ZdaPv(void *p) {                  /* operator delete[](void*) */
    if (!p) return;
    if (!real_free) init();
    emit_site('d', 0, p, __builtin_return_address(0));
    real_free(p);
}

void _ZdaPvm(void *p, size_t s) { (void)s; _ZdaPv(p); }

void *malloc(size_t size) {
    if (!real_malloc) {
        if (initing) {           /* dlsym re-entry */
            void *p = boot_buf + boot_off;
            boot_off = (boot_off + size + 15) & ~(size_t)15;
            return p;
        }
        init();
    }
    void *p = real_malloc(size);
    emit('m', size, p);
    return p;
}

void free(void *p) {
    if (!p) return;
    if ((char *)p >= boot_buf && (char *)p < boot_buf + sizeof(boot_buf))
        return;
    if (!real_free) init();
    emit('f', 0, p);
    real_free(p);
}

void *calloc(size_t nmemb, size_t size) {
    if (!real_calloc) {
        if (initing) {
            size_t total = nmemb * size;
            void *p = boot_buf + boot_off;
            boot_off = (boot_off + total + 15) & ~(size_t)15;
            memset(p, 0, total);
            return p;
        }
        init();
    }
    void *p = real_calloc(nmemb, size);
    emit('m', nmemb * size, p);
    return p;
}

void *realloc(void *old, size_t size) {
    if (!real_realloc) init();
    void *p = real_realloc(old, size);
    if (old) emit('f', 0, old);
    emit('m', size, p);
    return p;
}
