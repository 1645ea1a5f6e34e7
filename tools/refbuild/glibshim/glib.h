/* Minimal glib-1.2/2.0 API shim — just enough to compile the reference
 * exonerate C sources in this image (no system glib, zero egress).
 *
 * Used ONLY by tools/refbuild/build.sh to produce a reference binary
 * for byte-golden output generation and baseline timing.  Not part of
 * the exonerate_tpu framework and never shipped.
 *
 * API list derived from scanning /root/reference/src for g_* / G* uses:
 * memory (g_new/new0/renew/malloc/realloc/free), strings (g_strdup,
 * g_strndup, g_strdup_printf, g_strconcat, g_strnfill, g_strsplit,
 * g_strfreev, g_strjoinv, g_strstrip, g_strup, g_strcasecmp), GString,
 * GStringChunk, GPtrArray, GArray, GTree (new/insert/lookup/destroy),
 * logging (g_message/warning/critical/error/print, g_log_set_handler,
 * g_on_error_stack_trace), g_getenv, assorted macros.
 */
#ifndef GLIB_SHIM_H
#define GLIB_SHIM_H

#include <stdlib.h>
#include <stdio.h>
#include <string.h>
#include <strings.h>
#include <stdarg.h>
#include <ctype.h>
#include <inttypes.h>

#ifdef __cplusplus
extern "C" {
#endif

/* ---- basic types ---- */
typedef char       gchar;
typedef unsigned char guchar;
typedef short      gshort;
typedef unsigned short gushort;
typedef int        gint;
typedef unsigned int guint;
typedef long       glong;
typedef unsigned long gulong;
typedef float      gfloat;
typedef double     gdouble;
typedef int        gboolean;
typedef void      *gpointer;
typedef const void *gconstpointer;
typedef size_t     gsize;
typedef long       gssize;
typedef int8_t     gint8;
typedef uint8_t    guint8;
typedef int16_t    gint16;
typedef uint16_t   guint16;
typedef int32_t    gint32;
typedef uint32_t   guint32;
typedef int64_t    gint64;
typedef uint64_t   guint64;

#ifndef TRUE
#define TRUE 1
#endif
#ifndef FALSE
#define FALSE 0
#endif

#ifndef MAX
#define MAX(a,b) (((a)>(b))?(a):(b))
#endif
#ifndef MIN
#define MIN(a,b) (((a)<(b))?(a):(b))
#endif
#ifndef ABS
#define ABS(a) (((a)<0)?-(a):(a))
#endif
#ifndef CLAMP
#define CLAMP(x,lo,hi) (((x)>(hi))?(hi):(((x)<(lo))?(lo):(x)))
#endif

#define G_DIR_SEPARATOR '/'
#define G_DIR_SEPARATOR_S "/"
#define G_GNUC_EXTENSION __extension__
#define G_GNUC_NORETURN __attribute__((noreturn))
#define G_STMT_START do
#define G_STMT_END while(0)

#define GLIB_MAJOR_VERSION 2
#define GLIB_MINOR_VERSION 0
#define GLIB_MICRO_VERSION 0

#define GPOINTER_TO_INT(p)  ((gint)(glong)(p))
#define GINT_TO_POINTER(i)  ((gpointer)(glong)(i))
#define GPOINTER_TO_UINT(p) ((guint)(gulong)(p))
#define GUINT_TO_POINTER(u) ((gpointer)(gulong)(u))

#define G_MAXINT    2147483647
#define G_MININT    (-2147483647-1)
#define G_MAXUINT   4294967295U

#include <byteswap.h>
#if __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
#define GUINT64_TO_BE(v)   ((guint64)bswap_64((guint64)(v)))
#define GUINT64_FROM_BE(v) ((guint64)bswap_64((guint64)(v)))
#define GUINT32_TO_BE(v)   ((guint32)bswap_32((guint32)(v)))
#define GUINT32_FROM_BE(v) ((guint32)bswap_32((guint32)(v)))
#else
#define GUINT64_TO_BE(v)   ((guint64)(v))
#define GUINT64_FROM_BE(v) ((guint64)(v))
#define GUINT32_TO_BE(v)   ((guint32)(v))
#define GUINT32_FROM_BE(v) ((guint32)(v))
#endif
#define G_GINT64_CONSTANT(v) (v##LL)
#define G_GUINT64_CONSTANT(v) (v##ULL)
#define GUINT64_FORMAT PRIu64
#define G_GUINT64_FORMAT PRIu64
#define G_HAVE_GINT64 1

/* ---- assertions ---- */
#ifdef G_DISABLE_ASSERT
#define g_assert(expr) ((void)0)
#define g_assert_not_reached() ((void)0)
#else
#define g_assert(expr) \
    do { if(!(expr)) g_assertion_failed(__FILE__, __LINE__, #expr); } while(0)
#define g_assert_not_reached() \
    g_assertion_failed(__FILE__, __LINE__, "should not be reached")
#endif
void g_assertion_failed(const char *file, int line, const char *expr)
     __attribute__((noreturn));

/* ---- memory ---- */
gpointer g_malloc(gsize n);
gpointer g_malloc0(gsize n);
gpointer g_realloc(gpointer p, gsize n);
void     g_free(gpointer p);
#define g_new(T, n)   ((T*)g_malloc(sizeof(T) * (gsize)(n)))
#define g_new0(T, n)  ((T*)g_malloc0(sizeof(T) * (gsize)(n)))
#define g_renew(T, p, n) ((T*)g_realloc((p), sizeof(T) * (gsize)(n)))

/* ---- strings ---- */
gchar *g_strdup(const gchar *s);
gchar *g_strndup(const gchar *s, gsize n);
gchar *g_strnfill(gsize length, gchar fill);
gchar *g_strdup_printf(const gchar *fmt, ...)
       __attribute__((format(printf, 1, 2)));
gchar *g_strdup_vprintf(const gchar *fmt, va_list ap);
gchar *g_strconcat(const gchar *first, ...); /* NULL-terminated */
gchar **g_strsplit(const gchar *str, const gchar *delim, gint max_tokens);
void   g_strfreev(gchar **strv);
gchar *g_strjoinv(const gchar *sep, gchar **strv);
gchar *g_strstrip(gchar *s);     /* in place, returns s */
gchar *g_strup(gchar *s);        /* in place, returns s */
gchar *g_strdown(gchar *s);      /* in place, returns s */
#define g_strcasecmp strcasecmp
#define g_strncasecmp strncasecmp

/* ---- GString ---- */
typedef struct {
    gchar *str;
    gsize  len;
    gsize  allocated_len;
} GString;

GString *g_string_new(const gchar *init);
GString *g_string_sized_new(gsize size);
gchar   *g_string_free(GString *gs, gboolean free_segment);
GString *g_string_append(GString *gs, const gchar *s);
GString *g_string_append_c(GString *gs, gchar c);
GString *g_string_append_len(GString *gs, const gchar *s, gssize n);
GString *g_string_truncate(GString *gs, gsize len);

/* ---- GStringChunk ---- */
typedef struct _GStringChunk GStringChunk;
GStringChunk *g_string_chunk_new(gsize size_hint);
gchar        *g_string_chunk_insert(GStringChunk *chunk, const gchar *s);
void          g_string_chunk_free(GStringChunk *chunk);

/* ---- GPtrArray ---- */
typedef struct {
    gpointer *pdata;
    guint     len;
} GPtrArray;

GPtrArray *g_ptr_array_new(void);
void       g_ptr_array_add(GPtrArray *a, gpointer p);
gpointer  *g_ptr_array_free(GPtrArray *a, gboolean free_segment);
gboolean   g_ptr_array_remove(GPtrArray *a, gpointer p);
gboolean   g_ptr_array_remove_fast(GPtrArray *a, gpointer p);
void       g_ptr_array_set_size(GPtrArray *a, gint length);

/* ---- GArray ---- */
typedef struct {
    gchar *data;
    guint  len;
} GArray;

GArray *g_array_new(gboolean zero_terminated, gboolean clear,
                    guint element_size);
GArray *g_array_append_vals(GArray *a, gconstpointer data, guint len);
GArray *g_array_set_size(GArray *a, guint length);
gchar  *g_array_free(GArray *a, gboolean free_segment);
#define g_array_append_val(a, v) g_array_append_vals((a), &(v), 1)
#define g_array_index(a, T, i) (((T*)(void*)(a)->data)[(i)])

/* ---- GTree (plain BST; reference uses only new/insert/lookup/destroy) */
typedef gint (*GCompareFunc)(gconstpointer a, gconstpointer b);
typedef struct _GTree GTree;
GTree   *g_tree_new(GCompareFunc cmp);
void     g_tree_insert(GTree *t, gpointer key, gpointer value);
gpointer g_tree_lookup(GTree *t, gconstpointer key);
void     g_tree_destroy(GTree *t);

/* ---- logging ---- */
typedef enum {
    G_LOG_FLAG_RECURSION = 1 << 0,
    G_LOG_FLAG_FATAL     = 1 << 1,
    G_LOG_LEVEL_ERROR    = 1 << 2,
    G_LOG_LEVEL_CRITICAL = 1 << 3,
    G_LOG_LEVEL_WARNING  = 1 << 4,
    G_LOG_LEVEL_MESSAGE  = 1 << 5,
    G_LOG_LEVEL_INFO     = 1 << 6,
    G_LOG_LEVEL_DEBUG    = 1 << 7
} GLogLevelFlags;

typedef void (*GLogFunc)(const gchar *log_domain, GLogLevelFlags level,
                         const gchar *message, gpointer user_data);

guint g_log_set_handler(const gchar *domain, GLogLevelFlags levels,
                        GLogFunc func, gpointer user_data);
void g_print(const gchar *fmt, ...)
     __attribute__((format(printf, 1, 2)));
void g_printerr(const gchar *fmt, ...)
     __attribute__((format(printf, 1, 2)));
void g_message(const gchar *fmt, ...)
     __attribute__((format(printf, 1, 2)));
void g_warning(const gchar *fmt, ...)
     __attribute__((format(printf, 1, 2)));
void g_critical(const gchar *fmt, ...)
     __attribute__((format(printf, 1, 2)));
void g_error(const gchar *fmt, ...)
     __attribute__((format(printf, 1, 2), noreturn));
void g_on_error_stack_trace(const gchar *prg_name);

/* ---- misc ---- */
const gchar *g_getenv(const gchar *name);

#ifdef __cplusplus
}
#endif

#endif /* GLIB_SHIM_H */
