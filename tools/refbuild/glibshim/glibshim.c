/* Implementation of the minimal glib shim (see glib.h). */
#define _GNU_SOURCE
#include "glib.h"

/* ---- assertions ---- */
#include <execinfo.h>
#include <signal.h>

static void shim_segv_handler(int sig){
    void *frames[32];
    int n = backtrace(frames, 32);
    fprintf(stderr, "** caught signal %d\n", sig);
    backtrace_symbols_fd(frames, n, 2);
    signal(sig, SIG_DFL);
    raise(sig);
}

__attribute__((constructor))
static void shim_install_handlers(void){
    signal(SIGSEGV, shim_segv_handler);
    signal(SIGBUS, shim_segv_handler);
}

void g_assertion_failed(const char *file, int line, const char *expr){
    void *frames[32];
    int n;
    fprintf(stderr, "** assertion failed: (%s) at %s:%d\n",
            expr, file, line);
    n = backtrace(frames, 32);
    backtrace_symbols_fd(frames, n, 2);
    abort();
}

/* ---- memory ---- */
gpointer g_malloc(gsize n){
    gpointer p;
    if(!n)
        return NULL;
    p = malloc(n);
    if(!p){
        fprintf(stderr, "** g_malloc(%lu) failed\n", (unsigned long)n);
        abort();
    }
    return p;
}

gpointer g_malloc0(gsize n){
    gpointer p = g_malloc(n);
    if(p)
        memset(p, 0, n);
    return p;
}

gpointer g_realloc(gpointer p, gsize n){
    gpointer q;
    if(!n){
        free(p);
        return NULL;
    }
    q = realloc(p, n);
    if(!q){
        fprintf(stderr, "** g_realloc(%lu) failed\n", (unsigned long)n);
        abort();
    }
    return q;
}

void g_free(gpointer p){
    free(p);
}

/* ---- strings ---- */
gchar *g_strdup(const gchar *s){
    return s ? strdup(s) : NULL;
}

gchar *g_strndup(const gchar *s, gsize n){
    gchar *r;
    gsize len;
    if(!s)
        return NULL;
    len = strnlen(s, n);
    r = g_new(gchar, len + 1);
    memcpy(r, s, len);
    r[len] = '\0';
    return r;
}

gchar *g_strnfill(gsize length, gchar fill){
    gchar *r = g_new(gchar, length + 1);
    memset(r, fill, length);
    r[length] = '\0';
    return r;
}

gchar *g_strdup_vprintf(const gchar *fmt, va_list ap){
    gchar *r = NULL;
    if(vasprintf(&r, fmt, ap) < 0){
        fprintf(stderr, "** g_strdup_vprintf failed\n");
        abort();
    }
    return r;
}

gchar *g_strdup_printf(const gchar *fmt, ...){
    va_list ap;
    gchar *r;
    va_start(ap, fmt);
    r = g_strdup_vprintf(fmt, ap);
    va_end(ap);
    return r;
}

gchar *g_strconcat(const gchar *first, ...){
    va_list ap;
    gsize total = 0, pos = 0;
    const gchar *s;
    gchar *r;
    if(!first)
        return NULL;
    total = strlen(first);
    va_start(ap, first);
    while((s = va_arg(ap, const gchar*)))
        total += strlen(s);
    va_end(ap);
    r = g_new(gchar, total + 1);
    pos = strlen(first);
    memcpy(r, first, pos);
    va_start(ap, first);
    while((s = va_arg(ap, const gchar*))){
        gsize l = strlen(s);
        memcpy(r + pos, s, l);
        pos += l;
    }
    va_end(ap);
    r[pos] = '\0';
    return r;
}

/* glib semantics: delimiter is the full string; max_tokens<1 means
 * unlimited; the final token contains the remainder. Empty input gives
 * an empty (NULL-only) vector. */
gchar **g_strsplit(const gchar *str, const gchar *delim, gint max_tokens){
    GPtrArray *parts = g_ptr_array_new();
    gsize dlen = strlen(delim);
    const gchar *p = str, *hit;
    gchar **vec;
    guint i;
    if(max_tokens < 1)
        max_tokens = G_MAXINT;
    if(*str){
        while((gint)parts->len + 1 < max_tokens
              && (hit = strstr(p, delim)) != NULL){
            g_ptr_array_add(parts, g_strndup(p, (gsize)(hit - p)));
            p = hit + dlen;
        }
        g_ptr_array_add(parts, g_strdup(p));
    }
    vec = g_new(gchar*, parts->len + 1);
    for(i = 0; i < parts->len; i++)
        vec[i] = (gchar*)parts->pdata[i];
    vec[parts->len] = NULL;
    g_ptr_array_free(parts, TRUE);
    return vec;
}

void g_strfreev(gchar **strv){
    gchar **p;
    if(!strv)
        return;
    for(p = strv; *p; p++)
        g_free(*p);
    g_free(strv);
}

gchar *g_strjoinv(const gchar *sep, gchar **strv){
    gsize total = 0, slen = sep ? strlen(sep) : 0, pos = 0;
    gchar **p;
    gchar *r;
    if(!strv[0])
        return g_strdup("");
    for(p = strv; *p; p++)
        total += strlen(*p) + slen;
    r = g_new(gchar, total + 1);
    for(p = strv; *p; p++){
        gsize l = strlen(*p);
        if(p != strv && slen){
            memcpy(r + pos, sep, slen);
            pos += slen;
        }
        memcpy(r + pos, *p, l);
        pos += l;
    }
    r[pos] = '\0';
    return r;
}

gchar *g_strstrip(gchar *s){
    gsize len;
    gchar *start = s;
    while(*start && isspace((guchar)*start))
        start++;
    len = strlen(start);
    memmove(s, start, len + 1);
    while(len && isspace((guchar)s[len-1]))
        s[--len] = '\0';
    return s;
}

gchar *g_strup(gchar *s){
    gchar *p;
    for(p = s; *p; p++)
        *p = (gchar)toupper((guchar)*p);
    return s;
}

gchar *g_strdown(gchar *s){
    gchar *p;
    for(p = s; *p; p++)
        *p = (gchar)tolower((guchar)*p);
    return s;
}

/* ---- GString ---- */
static void g_string_ensure(GString *gs, gsize need){
    if(need + 1 > gs->allocated_len){
        gsize cap = gs->allocated_len ? gs->allocated_len : 16;
        while(cap < need + 1)
            cap <<= 1;
        gs->str = g_realloc(gs->str, cap);
        gs->allocated_len = cap;
    }
}

GString *g_string_sized_new(gsize size){
    GString *gs = g_new0(GString, 1);
    g_string_ensure(gs, size);
    gs->str[0] = '\0';
    gs->len = 0;
    return gs;
}

GString *g_string_new(const gchar *init){
    GString *gs = g_string_sized_new(init ? strlen(init) : 0);
    if(init)
        g_string_append(gs, init);
    return gs;
}

gchar *g_string_free(GString *gs, gboolean free_segment){
    gchar *seg = gs->str;
    g_free(gs);
    if(free_segment){
        g_free(seg);
        return NULL;
    }
    return seg;
}

GString *g_string_append_len(GString *gs, const gchar *s, gssize n){
    gsize l = (n < 0) ? strlen(s) : (gsize)n;
    g_string_ensure(gs, gs->len + l);
    memcpy(gs->str + gs->len, s, l);
    gs->len += l;
    gs->str[gs->len] = '\0';
    return gs;
}

GString *g_string_append(GString *gs, const gchar *s){
    return g_string_append_len(gs, s, -1);
}

GString *g_string_append_c(GString *gs, gchar c){
    g_string_ensure(gs, gs->len + 1);
    gs->str[gs->len++] = c;
    gs->str[gs->len] = '\0';
    return gs;
}

GString *g_string_truncate(GString *gs, gsize len){
    if(len < gs->len){
        gs->len = len;
        gs->str[len] = '\0';
    }
    return gs;
}

/* ---- GStringChunk ---- */
struct _GStringChunk {
    GPtrArray *strings;
};

GStringChunk *g_string_chunk_new(gsize size_hint){
    GStringChunk *c = g_new(GStringChunk, 1);
    (void)size_hint;
    c->strings = g_ptr_array_new();
    return c;
}

gchar *g_string_chunk_insert(GStringChunk *c, const gchar *s){
    gchar *dup = g_strdup(s);
    g_ptr_array_add(c->strings, dup);
    return dup;
}

void g_string_chunk_free(GStringChunk *c){
    guint i;
    for(i = 0; i < c->strings->len; i++)
        g_free(c->strings->pdata[i]);
    g_ptr_array_free(c->strings, TRUE);
    g_free(c);
}

/* ---- GPtrArray ---- */
typedef struct {
    GPtrArray pub;
    guint alloc;
} RealPtrArray;

GPtrArray *g_ptr_array_new(void){
    RealPtrArray *r = g_new0(RealPtrArray, 1);
    return &r->pub;
}

static void g_ptr_array_ensure(GPtrArray *a, guint need){
    RealPtrArray *r = (RealPtrArray*)a;
    if(need > r->alloc){
        guint cap = r->alloc ? r->alloc : 8;
        while(cap < need)
            cap <<= 1;
        a->pdata = g_realloc(a->pdata, cap * sizeof(gpointer));
        r->alloc = cap;
    }
}

void g_ptr_array_add(GPtrArray *a, gpointer p){
    g_ptr_array_ensure(a, a->len + 1);
    a->pdata[a->len++] = p;
}

gpointer *g_ptr_array_free(GPtrArray *a, gboolean free_segment){
    gpointer *seg = a->pdata;
    g_free(a);
    if(free_segment){
        g_free(seg);
        return NULL;
    }
    return seg;
}

gboolean g_ptr_array_remove(GPtrArray *a, gpointer p){
    guint i;
    for(i = 0; i < a->len; i++)
        if(a->pdata[i] == p){
            memmove(a->pdata + i, a->pdata + i + 1,
                    (a->len - i - 1) * sizeof(gpointer));
            a->len--;
            return TRUE;
        }
    return FALSE;
}

gboolean g_ptr_array_remove_fast(GPtrArray *a, gpointer p){
    guint i;
    for(i = 0; i < a->len; i++)
        if(a->pdata[i] == p){
            a->pdata[i] = a->pdata[a->len - 1];
            a->len--;
            return TRUE;
        }
    return FALSE;
}

void g_ptr_array_set_size(GPtrArray *a, gint length){
    guint n = (length < 0) ? 0 : (guint)length;
    if(n > a->len){
        g_ptr_array_ensure(a, n);
        memset(a->pdata + a->len, 0, (n - a->len) * sizeof(gpointer));
    }
    a->len = n;
}

/* ---- GArray ---- */
typedef struct {
    GArray pub;
    guint elt_size;
    guint alloc;           /* in elements */
    gboolean zero_terminated;
    gboolean clear;
} RealArray;

GArray *g_array_new(gboolean zero_terminated, gboolean clear,
                    guint element_size){
    RealArray *r = g_new0(RealArray, 1);
    r->elt_size = element_size;
    r->zero_terminated = zero_terminated;
    r->clear = clear;
    return &r->pub;
}

static void g_array_ensure(GArray *a, guint need){
    RealArray *r = (RealArray*)a;
    guint reserve = need + (r->zero_terminated ? 1 : 0);
    if(reserve > r->alloc){
        guint cap = r->alloc ? r->alloc : 8;
        guint old = r->alloc;
        while(cap < reserve)
            cap <<= 1;
        a->data = g_realloc(a->data, (gsize)cap * r->elt_size);
        if(r->clear || r->zero_terminated)
            memset(a->data + (gsize)old * r->elt_size, 0,
                   (gsize)(cap - old) * r->elt_size);
        r->alloc = cap;
    }
}

GArray *g_array_append_vals(GArray *a, gconstpointer data, guint len){
    RealArray *r = (RealArray*)a;
    g_array_ensure(a, a->len + len);
    memcpy(a->data + (gsize)a->len * r->elt_size, data,
           (gsize)len * r->elt_size);
    a->len += len;
    if(r->zero_terminated)
        memset(a->data + (gsize)a->len * r->elt_size, 0, r->elt_size);
    return a;
}

GArray *g_array_set_size(GArray *a, guint length){
    RealArray *r = (RealArray*)a;
    if(length > a->len)
        g_array_ensure(a, length);
    a->len = length;
    if(r->zero_terminated)
        memset(a->data + (gsize)a->len * r->elt_size, 0, r->elt_size);
    return a;
}

gchar *g_array_free(GArray *a, gboolean free_segment){
    gchar *seg = a->data;
    g_free(a);
    if(free_segment){
        g_free(seg);
        return NULL;
    }
    return seg;
}

/* ---- GTree ---- */
typedef struct TreeNode {
    struct TreeNode *left, *right;
    gpointer key, value;
} TreeNode;

struct _GTree {
    GCompareFunc cmp;
    TreeNode *root;
};

GTree *g_tree_new(GCompareFunc cmp){
    GTree *t = g_new0(GTree, 1);
    t->cmp = cmp;
    return t;
}

void g_tree_insert(GTree *t, gpointer key, gpointer value){
    TreeNode **slot = &t->root;
    while(*slot){
        gint c = t->cmp(key, (*slot)->key);
        if(c == 0){
            (*slot)->key = key;
            (*slot)->value = value;
            return;
        }
        slot = (c < 0) ? &(*slot)->left : &(*slot)->right;
    }
    *slot = g_new0(TreeNode, 1);
    (*slot)->key = key;
    (*slot)->value = value;
}

gpointer g_tree_lookup(GTree *t, gconstpointer key){
    TreeNode *n = t->root;
    while(n){
        gint c = t->cmp(key, n->key);
        if(c == 0)
            return n->value;
        n = (c < 0) ? n->left : n->right;
    }
    return NULL;
}

static void tree_node_destroy(TreeNode *n){
    if(!n)
        return;
    tree_node_destroy(n->left);
    tree_node_destroy(n->right);
    g_free(n);
}

void g_tree_destroy(GTree *t){
    tree_node_destroy(t->root);
    g_free(t);
}

/* ---- logging ---- */
static GLogFunc log_handler = NULL;
static gpointer log_handler_data = NULL;
static GLogLevelFlags log_handler_levels = 0;

guint g_log_set_handler(const gchar *domain, GLogLevelFlags levels,
                        GLogFunc func, gpointer user_data){
    (void)domain;
    log_handler = func;
    log_handler_data = user_data;
    log_handler_levels = levels;
    return 1;
}

void g_print(const gchar *fmt, ...){
    va_list ap;
    va_start(ap, fmt);
    vfprintf(stdout, fmt, ap);
    va_end(ap);
}

void g_printerr(const gchar *fmt, ...){
    va_list ap;
    va_start(ap, fmt);
    vfprintf(stderr, fmt, ap);
    va_end(ap);
}

static void g_log_emit(GLogLevelFlags level, const gchar *prefix,
                       const gchar *fmt, va_list ap){
    gchar *msg = g_strdup_vprintf(fmt, ap);
    if(log_handler && (log_handler_levels & level)){
        log_handler(NULL, level, msg, log_handler_data);
    } else {
        fprintf(stderr, "** %s: %s\n", prefix, msg);
    }
    g_free(msg);
}

void g_message(const gchar *fmt, ...){
    va_list ap;
    va_start(ap, fmt);
    g_log_emit(G_LOG_LEVEL_MESSAGE, "Message", fmt, ap);
    va_end(ap);
}

void g_warning(const gchar *fmt, ...){
    va_list ap;
    va_start(ap, fmt);
    g_log_emit(G_LOG_LEVEL_WARNING, "Warning", fmt, ap);
    va_end(ap);
}

void g_critical(const gchar *fmt, ...){
    va_list ap;
    va_start(ap, fmt);
    g_log_emit(G_LOG_LEVEL_CRITICAL, "CRITICAL", fmt, ap);
    va_end(ap);
}

void g_error(const gchar *fmt, ...){
    va_list ap;
    va_start(ap, fmt);
    g_log_emit(G_LOG_LEVEL_ERROR, "ERROR", fmt, ap);
    va_end(ap);
    abort();
}

void g_on_error_stack_trace(const gchar *prg_name){
    (void)prg_name;
}

/* ---- misc ---- */
const gchar *g_getenv(const gchar *name){
    return getenv(name);
}
